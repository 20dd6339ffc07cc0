"""sgg.models — encoders, triple decoders, and the critic.

Capability parity with SURVEY.md §2.1 #2 (VGG feature extractor),
#4 (attention-LSTM generator), #5 (critic), plus the backbone/decoder swaps
from BASELINE.json configs 3–4 (ResNet-50, ViT-B/16 + transformer decoder).
"""

from sgg.models.lstm import TF1LSTMCell
from sgg.models.attention import AdditiveAttention
from sgg.models.generator import AttentionLSTMGenerator, TRIPLE_LEN
from sgg.models.discriminator import TripleCritic
from sgg.models.transformer import TransformerTripleGenerator
from sgg.models.vgg import VGG19Features, load_npy_weights, vgg_preprocess
from sgg.models.resnet import ResNet50Features
from sgg.models.vit import ViTB16Features
from sgg.models.encoders import make_encoder

__all__ = [
    "TF1LSTMCell",
    "AdditiveAttention",
    "AttentionLSTMGenerator",
    "TRIPLE_LEN",
    "TripleCritic",
    "TransformerTripleGenerator",
    "VGG19Features",
    "load_npy_weights",
    "vgg_preprocess",
    "ResNet50Features",
    "ViTB16Features",
    "make_encoder",
]
