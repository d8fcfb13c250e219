"""CLI entry points: `python -m molclr_tpu.cli.pretrain` and
`python -m molclr_tpu.cli.finetune` (mirroring the reference's
`python molclr.py` / `python finetune.py`, README.md:52-66)."""
