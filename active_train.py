"""Active-learning trainer CLI — the primary entry point.

Parity: reference active_train.py (flag surface, derived defaults, loop
behavior). The loop itself lives in
deep_active_semantic_segmentation_tpu/engine/active_loop.py.
"""

import argparse

from deep_active_semantic_segmentation_tpu.config import (
    add_common_flags, config_from_args)
from deep_active_semantic_segmentation_tpu.parallel.mesh import make_mesh


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU DeeplabV3Plus active training")
    add_common_flags(parser)
    args = config_from_args(parser.parse_args(argv))

    mesh = make_mesh(args.num_devices)
    cfg = args.finalize(n_devices=mesh.devices.size)
    print(cfg)
    print("Using random seed =", cfg.seed)

    from deep_active_semantic_segmentation_tpu.engine.active_loop import (
        run_active_loop)

    run_active_loop(cfg, mesh=mesh)


if __name__ == "__main__":
    main()
