"""Torch test oracle replicating the reference fusion model's math
(CVPR_code/multimodal_model.py) with the reference's state_dict key names,
so converter + numerics parity tests run hermetically (the real reference
needs torchvision + HF downloads; this uses our torchvision-layout
EfficientNet replica and a random-init HF DistilBertModel)."""

import numpy as np
import torch
import torch.nn as nn

from .efficientnet_ref import EfficientNetRef, V2_M_STAGES, V2_NORM


class ExtractorRef(nn.Module):
    """EfficientNetV2MFullFeatureExtractor layout (multimodal_model.py:11-36)."""

    def __init__(self):
        super().__init__()
        net = EfficientNetRef(V2_M_STAGES, 24, 1280, V2_NORM)
        f = net.features
        self.stem = nn.Sequential(f[0], f[1])
        for i in range(1, 7):
            setattr(self, f"stage{i}", f[i + 1])
        self.final_conv = f[8]
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(nn.Dropout(0.3))

    def forward(self, x):
        x = self.stem(x)
        x = self.stage1(x)
        x = self.stage2(x)
        s3 = self.stage3(x)
        x = self.stage4(s3)
        x = self.stage5(x)
        s6 = self.stage6(x)
        x = self.final_conv(s6)
        x = torch.flatten(self.avgpool(x), 1)
        return s3, s6, x


class SA(nn.Module):
    def __init__(self, d_in, d_kq, d_v):
        super().__init__()
        self.d_out_kq = d_kq
        self.W_query = nn.Linear(d_in, d_kq)
        self.W_key = nn.Linear(d_in, d_kq)
        self.W_value = nn.Linear(d_in, d_v)
        self.norm = nn.LayerNorm(d_v)
        self.relu = nn.ReLU()

    def forward(self, x):
        w = torch.softmax(self.W_query(x) @ self.W_key(x).transpose(-1, -2)
                          / self.d_out_kq ** 0.5, dim=-1)
        return self.relu(self.norm(w @ self.W_value(x)))


class RCA(nn.Module):
    def __init__(self, d_in1, d_in2, d_kq, d_v, reverse):
        super().__init__()
        self.d_out_kq = d_kq
        self.reverse = reverse
        self.W_query = nn.Linear(d_in1, d_kq)
        self.W_key = nn.Linear(d_in2, d_kq)
        self.W_value = nn.Linear(d_in2, d_v)
        self.norm = nn.LayerNorm(d_v)
        self.relu = nn.ReLU()

    def forward(self, x1, x2):
        a = torch.softmax(self.W_query(x1) @ self.W_key(x2).transpose(-1, -2)
                          / self.d_out_kq ** 0.5, dim=-1)
        if self.reverse:
            a = (1.0 - a) / (a.shape[1] - 1)
        return self.relu(self.norm(a @ self.W_value(x2)))


class Hadamard2(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.kernel1 = nn.Parameter(torch.randn(dim))
        self.kernel2 = nn.Parameter(torch.randn(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, a, b):
        return torch.tanh(a * self.kernel1 + b * self.kernel2 + self.bias)


class FusionRef(nn.Module):
    """All heads, reference names; forward(strategy) dispatches."""

    def __init__(self, text_model, batch_size=16, reverse=False,
                 features_only=False, cross_attention_only=False,
                 n_classes=4):
        super().__init__()
        self.text_model = text_model
        self.image_model = ExtractorRef()
        hid = text_model.config.hidden_size
        self.features_only = features_only
        self.cross_attention_only = cross_attention_only
        self.batch_size = batch_size

        self.image_to_hidden_size = nn.Linear(1280, 256)
        self.text_to_hidden_size = nn.Linear(hid, 256)
        self.concat_layer = nn.Linear(512, 256)
        self.fc_layer = nn.Linear(256, n_classes)
        self.image_features_hidden_layer = nn.Linear(1280, 256)
        self.text_features_hidden_layer = nn.Linear(hid, 256)
        self.z_layer = nn.Linear(512, 256)
        self.fc_layer_gated = nn.Linear(256, n_classes)
        self.clip_fc_layer = nn.Linear(batch_size, n_classes)
        self.trans_conv = nn.ConvTranspose1d(8, 8, 2, stride=2)
        self.logit_scale = nn.Parameter(torch.ones([]) * np.log(1 / 0.07))
        self.output_all_features = nn.Linear(640, 4)
        self.self_attention_image = SA(80, 128, 96)
        self.self_attention_text = SA(48, 128, 96)
        self.cross_attention_1 = RCA(96, 96, 64, 48, reverse)
        self.cross_attention_2 = RCA(96, 96, 64, 48, reverse)
        self.final = nn.Linear(48 * 16 * 2, n_classes)
        if features_only:
            self.final_features_only_linear = nn.Linear(1280 + 768, n_classes)
        if cross_attention_only:
            self.cross_attention_only_linear = nn.Linear(48 * 16 * 2, n_classes)
        self.final_with_everything = nn.Linear(48 * 16 * 2 + 1280 + 768, n_classes)
        self.final_hierarchical_image = nn.Linear(1280 + 2560 + 2048, 512)
        self.final_hierarchical_text = nn.Linear(768 * 3, 512)
        self.final_hierarchical_all = nn.Linear(1024, n_classes)
        self.relu = nn.ReLU()
        self.gru_text = nn.GRU(400, 400, batch_first=True)
        self.gru_audio = nn.GRU(400, 400, batch_first=True)
        self.fusion = Hadamard2(400)
        self.gru_bimodal = nn.GRU(400, 500, batch_first=True)
        self.dropout1 = nn.Dropout(0.86)
        self.concat_fc = nn.Linear(900, 450)
        self.dropout2 = nn.Dropout(0.86)
        self.modality_image_to_dim = nn.Linear(1280, 400)
        self.modality_text_to_dim = nn.Linear(768, 400)
        self.classifier = nn.Linear(450, 4)

    def towers(self, ids, mask, images, hiddens=False):
        out = self.text_model(input_ids=ids, attention_mask=mask,
                              output_hidden_states=hiddens)
        text = out[0][:, 0]
        s3, s6, img = self.image_model(images)
        return text, (out.hidden_states if hiddens else None), s3, s6, img

    def forward(self, ids, mask, images, strategy="MM_RCA"):
        if strategy == "gated":
            text, _, _, _, img = self.towers(ids, mask, images)
            it = torch.tanh(self.image_features_hidden_layer(img))
            tt = torch.tanh(self.text_features_hidden_layer(text))
            cat = torch.cat([self.image_features_hidden_layer(img),
                             self.text_features_hidden_layer(text)], dim=1)
            z = torch.softmax(self.z_layer(cat), dim=1)
            return self.fc_layer_gated(z * it + (1 - z) * tt)
        if strategy in ("classic", "normalized"):
            text, _, _, _, img = self.towers(ids, mask, images)
            ih = self.image_to_hidden_size(img)
            th = self.text_to_hidden_size(text)
            if strategy == "normalized":
                ih = ih / ih.norm(dim=1, keepdim=True)
                th = th / th.norm(dim=1, keepdim=True)
            return self.fc_layer(self.concat_layer(torch.cat([ih, th], dim=1)))
        if strategy == "clip":
            text, _, _, _, img = self.towers(ids, mask, images)
            ih = self.image_to_hidden_size(img)
            th = self.text_to_hidden_size(text)
            ih = ih / ih.norm(dim=1, keepdim=True)
            th = th / th.norm(dim=1, keepdim=True)
            lg = self.logit_scale.exp() * ih @ th.t()
            if lg.shape[0] != self.batch_size:
                lg = self.trans_conv(lg)
            return self.clip_fc_layer(lg)
        if strategy == "MM_RCA":
            text, _, _, _, img = self.towers(ids, mask, images)
            tn = text / text.norm(dim=1, keepdim=True)
            im = img / img.norm(dim=1, keepdim=True)
            bs = tn.shape[0]
            t = tn.reshape(bs, 16, 48)
            i = im.reshape(bs, 16, 80)
            tsa = self.self_attention_text(t)
            isa = self.self_attention_image(i)
            ti = self.cross_attention_1(tsa, isa).flatten(1)
            it = self.cross_attention_2(isa, tsa).flatten(1)
            if self.features_only:
                return self.final_features_only_linear(torch.cat([im, tn], 1))
            if self.cross_attention_only:
                return self.cross_attention_only_linear(torch.cat([ti, it], 1))
            return self.final_with_everything(torch.cat([ti, it, im, tn], 1))
        if strategy == "hierarchical":
            text, hiddens, s3, s6, img = self.towers(ids, mask, images, True)
            l2 = hiddens[2][:, 0]
            l4 = hiddens[4][:, 0]
            p3 = nn.AvgPool2d(7, 7)(s3).flatten(1)
            p6 = nn.AvgPool2d(6, 6)(s6).flatten(1)
            norm = lambda x: x / x.norm(dim=1, keepdim=True)
            ci = torch.cat([norm(img), norm(p3), norm(p6)], 1)
            ct = torch.cat([norm(text), norm(l2), norm(l4)], 1)
            hi = self.relu(self.final_hierarchical_image(ci))
            ht = self.relu(self.final_hierarchical_text(ct))
            return self.final_hierarchical_all(torch.cat([hi, ht], 1))
        if strategy == "bimodal":
            text, _, _, _, img = self.towers(ids, mask, images)
            tn = text / text.norm(dim=1, keepdim=True)
            im = img / img.norm(dim=1, keepdim=True)
            xt = self.modality_text_to_dim(tn)
            xi = self.modality_image_to_dim(im)
            ct, _ = self.gru_text(xt)
            ca, _ = self.gru_audio(xi)
            fused = self.fusion(ct, ca)
            cf, _ = self.gru_bimodal(fused)
            comb = torch.cat([fused, cf], dim=-1)
            return self.classifier(self.relu(self.concat_fc(comb)))
        raise ValueError(strategy)
