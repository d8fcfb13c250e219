"""Train state pytree shared by both trainers."""

from __future__ import annotations

from typing import Any

from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int
