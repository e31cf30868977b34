"""Training utilities: savers, summaries, early stopping, class weights."""
