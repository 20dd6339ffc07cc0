"""sgg.models — encoders, triple decoders, and the critic.

Capability parity with SURVEY.md §2.1 #2 (VGG feature extractor),
#4 (attention-LSTM generator), #5 (critic), plus the backbone/decoder swaps
from BASELINE.json configs 3–4 (ResNet-50, ViT-B/16 + transformer decoder).
"""

from sgg.models.lstm import TF1LSTMCell
from sgg.models.attention import AdditiveAttention
from sgg.models.generator import AttentionLSTMGenerator, TRIPLE_LEN
from sgg.models.discriminator import TripleCritic

__all__ = [
    "TF1LSTMCell",
    "AdditiveAttention",
    "AttentionLSTMGenerator",
    "TRIPLE_LEN",
    "TripleCritic",
]
