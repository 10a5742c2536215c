"""Command-line entry points mapping to the five BASELINE configs.

    python -m human_3d_reconstruction_tpu.cli.demo   <preset> [--overrides]
    python -m human_3d_reconstruction_tpu.cli.train  <preset> [--overrides]
    python -m human_3d_reconstruction_tpu.cli.eval   h36m_eval [--overrides]
    python bench.py                                  (driver perf surface)

Reference parity: demo.py / train.py / eval.py scripts (SURVEY.md L5/L6).
"""
