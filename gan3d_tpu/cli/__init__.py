"""CLI entry points mirroring the reference's scripts.

reference -> here:
  main.py              -> python -m gan3d_tpu.cli.train
  eval.py              -> python -m gan3d_tpu.cli.eval
  eval_metrics.py      -> python -m gan3d_tpu.cli.eval_metrics
  tournament.py        -> python -m gan3d_tpu.cli.tournament
  real_ims.py          -> python -m gan3d_tpu.cli.real_ims
  make_dir_dataset.py  -> python -m gan3d_tpu.cli.make_dir_dataset
"""
