from diffpose_tpu.models.layers import (
    ChebGraphConv,
    GraphConvBlock,
    ResChebGC,
    ResChebGCDiff,
    TorchStyleLayerNorm,
    MultiHeadAttention,
    GraphNet,
    GraAttenLayer,
    timestep_embedding,
)
from diffpose_tpu.models.denoiser import GCNDiff
from diffpose_tpu.models.lifter import GCNPose
from diffpose_tpu.models.graformer import GraFormer
from diffpose_tpu.models.ema import ema_register, ema_update

__all__ = [
    "ChebGraphConv",
    "GraphConvBlock",
    "ResChebGC",
    "ResChebGCDiff",
    "TorchStyleLayerNorm",
    "MultiHeadAttention",
    "GraphNet",
    "GraAttenLayer",
    "timestep_embedding",
    "GCNDiff",
    "GCNPose",
    "GraFormer",
    "ema_register",
    "ema_update",
]
