"""The reference's OUTER active-learning loop, run for real at tiny scale
on CPU (test scaffolding only — nothing here is framework code).

This reproduces /root/reference/active_train.py:376-527 with the
reference's own components: its ``ActiveCityscapesImage`` pool (seed-set
load, expand/reset/pad bookkeeping), its ``Cityscapes`` val set, its torch
DeepLab, its ``SegmentationLosses`` + ``LR_Scheduler`` + torch SGD with
1x/10x groups, its ``Evaluator``, best-checkpoint reload before selection
(active_train.py:440-443), and its selectors — so our ``run_active_loop``
can be compared head-to-head at the LOOP level (per-round pool bookkeeping
interacting with selection, best-reload timing, mIoU-vs-%labeled), not
just per-selector on a frozen state.
"""

from __future__ import annotations

import copy
import os
from typing import Dict, List

import numpy as np
import torch

import reference_bridge as rb


def make_learnable_records(num_images: int, height: int = 72,
                           width: int = 96, num_active_classes: int = 4,
                           block: int = 16, seed: int = 0,
                           split: str = "train") -> Dict[bytes, np.ndarray]:
    """Block-wise color-rule task (the round-2 convergence task at tiny
    scale): each block-aligned tile carries one class whose color encodes
    the label, plus per-image contrast variation so uncertainty scorers
    separate images. Learnable by DeepLab at output-stride 16 when
    ``block`` >= 16. Labels use the cityscapes 19-class range."""
    rng = np.random.RandomState(seed)
    records = {}
    for i in range(num_images):
        bh, bw = -(-height // block), -(-width // block)
        lab_small = rng.randint(0, num_active_classes, size=(bh, bw))
        lab = np.kron(lab_small, np.ones((block, block), dtype=np.int64))
        lab = lab[:height, :width].astype(np.uint8)
        scale = 0.5 + 1.0 * (i / max(num_images - 1, 1))
        img = np.stack([
            lab * (200 // num_active_classes) + 20,
            235 - lab * (200 // num_active_classes),
            np.full_like(lab, 128),
        ], axis=-1).astype(np.float64)
        noise = rng.randn(height, width, 3) * 8.0
        img = np.clip(128 + (img - 128) * scale + noise, 0, 255).astype(np.uint8)
        key = f"/leftImg8bit/{split}/city/img_{i:03d}.png".encode()
        records[key] = np.dstack((img, lab))
    return records


def write_reference_dataset_dir(tmpdir: str, seed_paths: List[bytes]) -> str:
    """The reference datasets read seed sets from the filesystem
    (active_cityscapes.py:26-30); the LMDBs themselves are faked via
    reference_bridge.set_lmdb_stores."""
    root = os.path.join(tmpdir, "refcity")
    os.makedirs(os.path.join(root, "seed_sets"), exist_ok=True)
    with open(os.path.join(root, "seed_sets", "set_0.txt"), "w") as f:
        for k in seed_paths:
            f.write(k.decode() + "\n")
    return root


def train_reference_deeplab(train_records: Dict, paths: List[bytes], *,
                            crop_size: int = 64, batch_size: int = 4,
                            epochs: int = 10, lr: float = 0.01,
                            num_classes: int = 19, seed: int = 1,
                            mc_dropout: bool = True):
    """Supervised-train the reference torch DeepLab on ``paths`` (the
    reference Trainer's per-round inner loop, active_train.py:89-127) and
    return (model, final_state_dict). Used to measure MC-dropout rank
    agreement on a TRAINED model (round-2 verdict missing #2: on a
    random-init model ref-vs-ref rank correlation is itself ~0.25, so
    agreement is unmeasurable by construction)."""
    rb.install_shims()
    torch.manual_seed(seed)
    np.random.seed(seed)
    torch.set_num_threads(max(os.cpu_count() - 1, 1))

    loss_mod = rb.import_reference("utils.loss")
    sched_mod = rb.import_reference("utils.lr_scheduler")
    pd_mod = rb.import_reference("dataloaders.dataset.paths_dataset")

    env = rb.FakeLmdbEnv(train_records, with_keys=True)
    # PathsDataset with labels = deterministic eval transform; good enough
    # for supervised fitting of the block rule
    dataset = pd_mod.PathsDataset(env, list(paths), crop_size,
                                  include_labels=True)
    loader = torch.utils.data.DataLoader(dataset, batch_size=batch_size,
                                         shuffle=True, num_workers=0)

    def _builder():
        from models.deeplab import DeepLab as TorchDeepLab

        return TorchDeepLab(backbone="mobilenet", output_stride=16,
                            num_classes=num_classes, mc_dropout=mc_dropout,
                            sync_bn=False, pretrained=False)

    model = rb.build_reference_model(_builder)
    criterion = loss_mod.SegmentationLosses(cuda=False).build_loss("ce")
    optimizer = torch.optim.SGD(
        [{"params": model.get_1x_lr_params(), "lr": lr},
         {"params": model.get_10x_lr_params(), "lr": lr * 10}],
        momentum=0.9, weight_decay=5e-4, nesterov=False)
    scheduler = sched_mod.LR_Scheduler("poly", lr, epochs, len(loader))

    model.train()
    for epoch in range(epochs):
        for i, sample in enumerate(loader):
            scheduler(optimizer, i, epoch, 0.0)
            optimizer.zero_grad()
            loss = criterion(model(sample["image"]), sample["label"])
            loss.backward()
            optimizer.step()
    model.eval()
    return model, copy.deepcopy(model.state_dict())


def run_reference_active_loop(train_records: Dict, val_records: Dict,
                              dataset_dir: str, *, mode: str = "ceal_entropy",
                              crop_size: int = 64, batch_size: int = 4,
                              active_batch_size: int = 4,
                              max_iterations: int = 3, epochs: int = 4,
                              eval_interval: int = 2, lr: float = 0.01,
                              num_classes: int = 19, seed: int = 1,
                              mc_seed_base: int = 0,
                              weak_label_entropy_threshold: float = 0.80,
                              weak_label_threshold_decay: float = 0.015,
                              pretrained_path: str = None) -> Dict:
    """active_train.py:376-527 at tiny scale. Returns per-round history,
    selections, remaining-pool snapshots and best state_dicts (for the
    controlled weight-transplant comparison).

    ``pretrained_path``: a local backbone state_dict (.pth) served through
    the reference's OWN ``_load_pretrained_model`` path
    (models/backbone/mobilenet.py:130-157 — its model_zoo.load_url is
    redirected to the file on this zero-egress host), so every per-round
    fresh model starts from the pinned backbone exactly as the reference's
    default pretrained=True config does."""
    rb.install_shims()
    rb.set_lmdb_stores({"refcity": train_records,
                        "refcity_val": val_records})
    zoo_patch = None
    if pretrained_path is not None:
        import torch.utils.model_zoo as model_zoo

        zoo_patch = model_zoo.load_url
        model_zoo.load_url = lambda url, **kw: torch.load(pretrained_path)
    try:
        return _run_loop(train_records, val_records, dataset_dir, mode,
                         crop_size, batch_size, active_batch_size,
                         max_iterations, epochs, eval_interval, lr,
                         num_classes, seed, mc_seed_base,
                         weak_label_entropy_threshold,
                         weak_label_threshold_decay,
                         pretrained=pretrained_path is not None)
    finally:
        rb.set_lmdb_stores({})
        if zoo_patch is not None:
            import torch.utils.model_zoo as model_zoo

            model_zoo.load_url = zoo_patch


def _run_loop(train_records, val_records, dataset_dir, mode, crop_size,
              batch_size, active_batch_size, max_iterations, epochs,
              eval_interval, lr, num_classes, seed, mc_seed_base,
              weak_label_entropy_threshold=0.80,
              weak_label_threshold_decay=0.015, pretrained=False):
    import random as pyrandom

    torch.manual_seed(seed)          # active_train.py:343
    pyrandom.seed(seed)
    np.random.seed(seed)
    torch.set_num_threads(max(os.cpu_count() - 1, 1))

    ac_mod = rb.import_reference("dataloaders.dataset.active_cityscapes")
    cs_mod = rb.import_reference("dataloaders.dataset.cityscapes")
    loss_mod = rb.import_reference("utils.loss")
    sched_mod = rb.import_reference("utils.lr_scheduler")
    metrics_mod = rb.import_reference("utils.metrics")

    # the val store is registered under a distinct path fragment
    training_set = ac_mod.ActiveCityscapesImage(
        path=dataset_dir, base_size=crop_size, crop_size=crop_size,
        split="train", init_set="set_0.txt", memory_hog_mode=False)
    val_root = dataset_dir + "_val"
    os.makedirs(val_root, exist_ok=True)
    val_set = cs_mod.Cityscapes(path=val_root, base_size=crop_size,
                                crop_size=crop_size, split="val",
                                memory_hog_mode=False)

    def build_model():
        def _builder():
            from models.deeplab import DeepLab as TorchDeepLab

            return TorchDeepLab(
                backbone="mobilenet", output_stride=16,
                num_classes=num_classes,
                mc_dropout=(mode in ("variance", "random")),
                sync_bn=False, pretrained=pretrained)

        return rb.build_reference_model(_builder)

    env = rb.FakeLmdbEnv(train_records, with_keys=True)
    if mode in ("variance", "random"):
        sel_mod = rb.import_reference("active_selection.mc_dropout")
        selector = sel_mod.ActiveSelectionMCDropout(num_classes, env,
                                                    crop_size, batch_size)
    elif mode.startswith("ceal"):
        sel_mod = rb.import_reference("active_selection.ceal")
        selector = sel_mod.ActiveSelectionCEAL(num_classes, env, crop_size,
                                               batch_size)
    else:
        raise NotImplementedError(mode)

    criterion = loss_mod.SegmentationLosses(cuda=False).build_loss("ce")
    evaluator = metrics_mod.Evaluator(num_classes)
    val_loader = torch.utils.data.DataLoader(val_set, batch_size=batch_size,
                                             shuffle=False, num_workers=0)

    total_iterations = min(
        len(training_set.image_paths) // active_batch_size - 1,
        max_iterations)

    out = dict(history={}, selections=[], remaining_before=[],
               best_state_dicts=[], fractions=[])

    for selection_iter in range(total_iterations):
        fraction = round(training_set.get_fraction_of_labeled_data() * 100)
        training_set.make_dataset_multiple_of_batchsize(batch_size)

        # fresh model every round (active_train.py:394)
        model = build_model()
        train_params = [
            {"params": model.get_1x_lr_params(), "lr": lr},
            {"params": model.get_10x_lr_params(), "lr": lr * 10}]
        optimizer = torch.optim.SGD(train_params, momentum=0.9,
                                    weight_decay=5e-4, nesterov=False)
        train_loader = torch.utils.data.DataLoader(
            training_set, batch_size=batch_size, shuffle=True, num_workers=0)
        scheduler = sched_mod.LR_Scheduler("poly", lr, epochs,
                                           len(train_loader))

        best = dict(mIoU=0.0)
        best_sd = None
        best_pred = 0.0
        for outer_epoch in range(epochs // eval_interval):
            for inner_epoch in range(eval_interval):
                epoch = outer_epoch * eval_interval + inner_epoch
                model.train()
                for i, sample in enumerate(train_loader):
                    image, target = sample["image"], sample["label"]
                    scheduler(optimizer, i, epoch, best_pred)
                    optimizer.zero_grad()
                    loss = criterion(model(image), target)
                    loss.backward()
                    optimizer.step()
            # validation (active_train.py:129-194)
            model.eval()
            evaluator.reset()
            with torch.no_grad():
                for sample in val_loader:
                    output = model(sample["image"])
                    pred = np.argmax(output.numpy(), axis=1)
                    evaluator.add_batch(sample["label"].numpy(), pred)
            mIoU = evaluator.Mean_Intersection_over_Union()
            best["mIoU"] = max(best["mIoU"], mIoU)
            if mIoU > best_pred:       # best-checkpoint tracking
                best_pred = mIoU
                best_sd = copy.deepcopy(model.state_dict())

        training_set.reset_dataset()
        out["history"][fraction] = dict(best)
        out["fractions"].append(fraction)

        if selection_iter == total_iterations - 1:
            break

        # reload best BEFORE selection (active_train.py:440-443)
        model.load_state_dict(best_sd)
        model.eval()
        out["best_state_dicts"].append(best_sd)
        out["remaining_before"].append(list(training_set.remaining_image_paths))

        wrapped = rb.FakeDataParallel(model)
        if mode == "ceal_entropy":
            selected, entropies = selector.get_maximum_entropy_samples(
                wrapped, training_set.remaining_image_paths,
                active_batch_size)
            out.setdefault("entropies", []).append(
                dict(zip(training_set.remaining_image_paths,
                         [float(e) for e in entropies])))
        elif mode == "ceal_entropy_weakly_labeled":
            # active_train.py:478-495: select + decaying-threshold weak
            # labels, selected set subtracted, prior weak labels cleared
            selected, entropies = selector.get_maximum_entropy_samples(
                wrapped, training_set.remaining_image_paths,
                active_batch_size)
            out.setdefault("entropies", []).append(
                dict(zip(training_set.remaining_image_paths,
                         [float(e) for e in entropies])))
            training_set.clear_weak_labels()
            threshold = (weak_label_entropy_threshold
                         - selection_iter * weak_label_threshold_decay)
            weak_labels = selector.get_weakly_labeled_data(
                wrapped, training_set.remaining_image_paths, threshold,
                entropies)
            for sample in selected:
                if sample in weak_labels:
                    del weak_labels[sample]
            out.setdefault("weak_sets", []).append(
                {k: np.asarray(v) for k, v in weak_labels.items()})
            out.setdefault("thresholds", []).append(float(threshold))
            training_set.expand_training_set(selected)
            training_set.add_weak_labels(weak_labels)
            out["selections"].append(list(selected))
            continue
        elif mode == "variance":
            torch.manual_seed(mc_seed_base + selection_iter)
            selected = selector.get_vote_entropy_for_images(
                wrapped, training_set.remaining_image_paths,
                active_batch_size)
        elif mode == "random":
            selected = selector.get_random_uncertainity(
                training_set.remaining_image_paths, active_batch_size)
        else:
            raise NotImplementedError(mode)
        out["selections"].append(list(selected))
        training_set.expand_training_set(selected)

    return out


def _build_ref_deeplab(num_classes: int, mc_dropout: bool):
    def _builder():
        from models.deeplab import DeepLab as TorchDeepLab

        return TorchDeepLab(backbone="mobilenet", output_stride=16,
                            num_classes=num_classes, mc_dropout=mc_dropout,
                            sync_bn=False, pretrained=False)

    return rb.build_reference_model(_builder)


def run_reference_region_loop(train_records: Dict, val_records: Dict,
                              dataset_dir: str, *, crop_size: int = 64,
                              batch_size: int = 4, region_size: int = 16,
                              active_batch_size: int = 1,
                              max_iterations: int = 3, epochs: int = 4,
                              eval_interval: int = 2, lr: float = 0.01,
                              num_classes: int = 19, seed: int = 1,
                              mc_seed_base: int = 0) -> Dict:
    """The reference's REGION-mode outer loop (active_train.py:459-464 with
    dataset=*_region): its ``ActiveCityscapesRegion`` pool (per-path region
    OrderedDicts, masked targets via invert_fix_scale_crop, pixel
    accounting), its MC-dropout ``create_region_maps`` (entropy sweep ->
    labeled-region suppression -> box-sum conv -> minmax norm -> square
    NMS) and expand_training_set(regions, counts*rs^2)."""
    import random as pyrandom

    rb.install_shims()
    rb.set_lmdb_stores({"refcity": train_records,
                        "refcity_val": val_records})
    try:
        torch.manual_seed(seed)
        pyrandom.seed(seed)
        np.random.seed(seed)
        torch.set_num_threads(max(os.cpu_count() - 1, 1))

        rc_mod = rb.import_reference("dataloaders.dataset.region_cityscapes")
        cs_mod = rb.import_reference("dataloaders.dataset.cityscapes")
        loss_mod = rb.import_reference("utils.loss")
        sched_mod = rb.import_reference("utils.lr_scheduler")
        metrics_mod = rb.import_reference("utils.metrics")
        sel_mod = rb.import_reference("active_selection.mc_dropout")

        training_set = rc_mod.ActiveCityscapesRegion(
            path=dataset_dir, base_size=crop_size, crop_size=crop_size,
            split="train", init_set="set_0.txt", memory_hog_mode=False)
        val_root = dataset_dir + "_val"
        os.makedirs(val_root, exist_ok=True)
        val_set = cs_mod.Cityscapes(path=val_root, base_size=crop_size,
                                    crop_size=crop_size, split="val",
                                    memory_hog_mode=False)

        env = rb.FakeLmdbEnv(train_records, with_keys=True)
        selector = sel_mod.ActiveSelectionMCDropout(num_classes, env,
                                                    crop_size, batch_size)
        criterion = loss_mod.SegmentationLosses(cuda=False).build_loss("ce")
        evaluator = metrics_mod.Evaluator(num_classes)
        val_loader = torch.utils.data.DataLoader(
            val_set, batch_size=batch_size, shuffle=False, num_workers=0)

        out = dict(history={}, regions=[], counts=[], existing_before=[],
                   best_state_dicts=[], fractions=[], labeled_pixels=[],
                   image_paths=list(training_set.image_paths))

        for selection_iter in range(max_iterations):
            fraction = round(
                training_set.get_fraction_of_labeled_data() * 100)
            training_set.make_dataset_multiple_of_batchsize(batch_size)

            model = _build_ref_deeplab(num_classes, mc_dropout=True)
            optimizer = torch.optim.SGD(
                [{"params": model.get_1x_lr_params(), "lr": lr},
                 {"params": model.get_10x_lr_params(), "lr": lr * 10}],
                momentum=0.9, weight_decay=5e-4, nesterov=False)
            train_loader = torch.utils.data.DataLoader(
                training_set, batch_size=batch_size, shuffle=True,
                num_workers=0)
            scheduler = sched_mod.LR_Scheduler("poly", lr, epochs,
                                               len(train_loader))

            best = dict(mIoU=0.0)
            best_sd = None
            best_pred = 0.0
            for outer_epoch in range(epochs // eval_interval):
                for inner_epoch in range(eval_interval):
                    epoch = outer_epoch * eval_interval + inner_epoch
                    model.train()
                    for i, sample in enumerate(train_loader):
                        scheduler(optimizer, i, epoch, best_pred)
                        optimizer.zero_grad()
                        loss = criterion(model(sample["image"]),
                                         sample["label"])
                        loss.backward()
                        optimizer.step()
                model.eval()
                evaluator.reset()
                with torch.no_grad():
                    for sample in val_loader:
                        output = model(sample["image"])
                        pred = np.argmax(output.numpy(), axis=1)
                        evaluator.add_batch(sample["label"].numpy(), pred)
                mIoU = evaluator.Mean_Intersection_over_Union()
                best["mIoU"] = max(best["mIoU"], mIoU)
                if mIoU > best_pred:
                    best_pred = mIoU
                    best_sd = copy.deepcopy(model.state_dict())

            training_set.reset_dataset()
            out["history"][fraction] = dict(best)
            out["fractions"].append(fraction)
            out["labeled_pixels"].append(training_set.labeled_pixel_count)

            if selection_iter == max_iterations - 1:
                break

            model.load_state_dict(best_sd)
            model.eval()
            out["best_state_dicts"].append(best_sd)
            out["existing_before"].append(
                [list(r) for r in training_set.get_existing_region_maps()])

            torch.manual_seed(mc_seed_base + selection_iter)
            regions, counts = selector.create_region_maps(
                rb.FakeDataParallel(model), training_set.image_paths,
                training_set.get_existing_region_maps(), region_size,
                active_batch_size)
            out["regions"].append({k: list(v) for k, v in regions.items()})
            out["counts"].append(int(counts))
            training_set.expand_training_set(
                regions, counts * region_size * region_size)

        return out
    finally:
        rb.set_lmdb_stores({})


def reference_region_selection(state_dict, train_records: Dict,
                               images: List[bytes], existing_regions,
                               region_size: int, selection_size: int, *,
                               crop_size: int = 64, batch_size: int = 4,
                               num_classes: int = 19, torch_seed: int = 0):
    """One reference ``create_region_maps`` call from a given state — used
    to measure the reference's own MC-seed-to-seed region-selection band
    (the baseline our controlled comparison is judged against)."""
    rb.install_shims()
    sel_mod = rb.import_reference("active_selection.mc_dropout")
    env = rb.FakeLmdbEnv(train_records, with_keys=True)
    selector = sel_mod.ActiveSelectionMCDropout(num_classes, env,
                                                crop_size, batch_size)
    model = _build_ref_deeplab(num_classes, mc_dropout=True)
    model.load_state_dict(state_dict)
    model.eval()
    torch.manual_seed(torch_seed)
    regions, counts = selector.create_region_maps(
        rb.FakeDataParallel(model), list(images),
        [list(r) for r in existing_regions], region_size, selection_size)
    return {k: list(v) for k, v in regions.items()}, int(counts)


def reference_region_score_maps(state_dict, train_records: Dict,
                                images: List[bytes], existing_regions,
                                region_size: int, *, crop_size: int = 64,
                                batch_size: int = 4, num_classes: int = 19,
                                torch_seed: int = 0) -> np.ndarray:
    """The reference's (N, S, S) box-sum score maps from a given state —
    the pre-NMS quantity create_region_maps feeds the greedy selection
    (mc_dropout.py:130-155: MC entropy sweep -> labeled-region suppression
    -> all-ones conv2d box filter). Used for the map-level controlled
    comparison: per-box Spearman is a stable statistic where box-level
    NMS agreement is MC-seed-chaotic (the NMS amplifies ulp-scale map
    differences into different greedy paths)."""
    rb.install_shims()
    sel_mod = rb.import_reference("active_selection.mc_dropout")
    pd_mod = rb.import_reference("dataloaders.dataset.paths_dataset")

    env = rb.FakeLmdbEnv(train_records, with_keys=True)
    selector = sel_mod.ActiveSelectionMCDropout(num_classes, env,
                                                crop_size, batch_size)
    model = _build_ref_deeplab(num_classes, mc_dropout=True)
    model.load_state_dict(state_dict)
    model.eval()

    def turn_on_dropout(m):
        if type(m) == torch.nn.Dropout2d:
            m.train()
    model.apply(turn_on_dropout)

    torch.manual_seed(torch_seed)
    wrapped = rb.FakeDataParallel(model)
    S = crop_size - region_size + 1
    score_maps = torch.zeros(len(images), S, S)
    weights = torch.ones(region_size, region_size)
    loader = torch.utils.data.DataLoader(
        pd_mod.PathsDataset(env, list(images), crop_size,
                            include_labels=True),
        batch_size=batch_size, shuffle=False, num_workers=0)
    map_ctr = 0
    for sample in loader:
        batch_maps = selector._get_vote_entropy_for_batch(
            wrapped, sample["image"], sample["label"])
        for entropy_map in batch_maps:
            sel_mod.ActiveSelectionMCDropout.suppress_labeled_entropy(
                entropy_map, list(existing_regions[map_ctr]))
            score_maps[map_ctr] = torch.nn.functional.conv2d(
                entropy_map.unsqueeze(0).unsqueeze(0),
                weights.unsqueeze(0).unsqueeze(0)).squeeze()
            map_ctr += 1
    return score_maps.numpy()
