"""Driver scripts (the reference's L5 layer — enjoy.py, tests/*.py —
rebuilt over the TPU engine).  Run as ``python -m ngx.cli.<name>``."""
