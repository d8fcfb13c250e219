"""Training runtime: config, optimizers/schedules, checkpointing (incl. the
torch-.pth importer used for reference parity), metrics, pretrain and
fine-tune loops."""
