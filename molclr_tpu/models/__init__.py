"""GNN encoders and heads (Flax) reproducing the reference model semantics.

Model zoo parity with /root/reference/models:
  - GINE / GCN trunks                 (ginet_molclr.py, gcn_molclr.py)
  - pretrain projection heads         (ginet_molclr.py:92-96)
  - fine-tune prediction heads        (ginet_finetune.py:96-127, gcn_finetune.py)
  - motif message-passing head        (ginet_finetune_mp.py:52-165)
"""

from molclr_tpu.models.layers import (
    MaskedBatchNorm,
    GINEConv,
    GCNConv,
    xavier_uniform_embed,
    torch_linear_kernel,
    torch_linear_bias,
)
from molclr_tpu.models.nets import (
    LinkFineTuneNet,
    GNNTrunk,
    MolCLRNet,
    FineTuneNet,
    MotifFineTuneNet,
    resolve_fused,
)

__all__ = [
    "MaskedBatchNorm", "GINEConv", "GCNConv",
    "xavier_uniform_embed", "torch_linear_kernel", "torch_linear_bias",
    "GNNTrunk", "MolCLRNet", "FineTuneNet", "MotifFineTuneNet", "LinkFineTuneNet",
    "resolve_fused",
]
