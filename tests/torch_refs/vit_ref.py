"""Hand-built torch replica of torchvision's VisionTransformer.

torchvision is not installed in this image, so parity tests build this
replica, whose state_dict uses the exact torchvision key layout
(class_token, conv_proj.*, encoder.pos_embedding,
encoder.layers.encoder_layer_{i}.*, encoder.ln.*, heads.head.*). Math
follows torchvision.models.vision_transformer.VisionTransformer (LN eps
1e-6, pre-norm blocks, exact GELU) — the same graph the reference builds
via models.py:222-258.
"""

import torch
import torch.nn as nn
from collections import OrderedDict


class MLPBlock(nn.Module):
    def __init__(self, d, mlp):
        super().__init__()
        self.linear_1 = nn.Linear(d, mlp)
        self.gelu = nn.GELU()
        self.linear_2 = nn.Linear(mlp, d)

    def forward(self, x):
        return self.linear_2(self.gelu(self.linear_1(x)))


class EncoderBlock(nn.Module):
    def __init__(self, d, heads, mlp):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = MLPBlock(d, mlp)

    def forward(self, x):
        h = self.ln_1(x)
        a, _ = self.self_attention(h, h, h, need_weights=False)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class Encoder(nn.Module):
    def __init__(self, seq, d, heads, mlp, layers):
        super().__init__()
        self.pos_embedding = nn.Parameter(torch.empty(1, seq, d).normal_(std=0.02))
        self.layers = nn.Sequential(OrderedDict(
            (f"encoder_layer_{i}", EncoderBlock(d, heads, mlp))
            for i in range(layers)))
        self.ln = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        return self.ln(self.layers(x + self.pos_embedding))


class VisionTransformerRef(nn.Module):
    def __init__(self, image_size=224, patch=16, d=768, heads=12, mlp=3072,
                 layers=12, num_classes=4):
        super().__init__()
        self.patch = patch
        self.d = d
        self.conv_proj = nn.Conv2d(3, d, patch, stride=patch)
        self.class_token = nn.Parameter(torch.zeros(1, 1, d))
        seq = (image_size // patch) ** 2 + 1
        self.encoder = Encoder(seq, d, heads, mlp, layers)
        self.heads = nn.Sequential(OrderedDict(
            [("head", nn.Linear(d, num_classes))]))

    def forward(self, x):
        n = x.shape[0]
        x = self.conv_proj(x)
        x = x.reshape(n, self.d, -1).permute(0, 2, 1)
        x = torch.cat([self.class_token.expand(n, -1, -1), x], dim=1)
        x = self.encoder(x)
        return self.heads(x[:, 0])
