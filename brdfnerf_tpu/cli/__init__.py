"""Command-line interfaces mirroring the reference's public CLI semantics:

  python -m brdfnerf_tpu.cli.train  ...   <- main.py   (reference README:108)
  python -m brdfnerf_tpu.cli.eval   ...   <- eval.py   (reference README:144)
  python -m brdfnerf_tpu.cli.create_dsm   <- create_dsm.py
"""
