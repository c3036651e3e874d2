"""Independent PyTorch oracle of the S2D video Mask2Former architecture.

Used ONLY by the parity tests: a from-scratch torch implementation of the
same published architecture (Mask2Former-video with a deformable-attention
pixel decoder), whose state_dict keys follow the reference checkpoint layout
so it doubles as a fixture for the torch->flax converter. Semantics follow
the architecture contract documented in s2d_tpu/models/*.py docstrings.
"""
from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


class ConvBN(nn.Conv2d):
    """Conv2d with an attached norm module (d2-style state keys)."""

    def __init__(self, cin, cout, k, stride=1, pad=0, bias=False, norm=None):
        super().__init__(cin, cout, k, stride, pad, bias=bias)
        if norm is not None:
            self.norm = norm

    def forward(self, x):
        x = super().forward(x)
        if hasattr(self, "norm"):
            x = self.norm(x)
        return x


def _bn(c):
    bn = nn.BatchNorm2d(c)
    # randomized frozen statistics so the affine fold is non-trivial
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1.0, 0.2)
        bn.bias.normal_(0, 0.2)
    return bn


class Bottleneck(nn.Module):
    def __init__(self, cin, cmid, cout, stride, has_shortcut):
        super().__init__()
        if has_shortcut:
            self.shortcut = ConvBN(cin, cout, 1, stride, norm=_bn(cout))
        self.conv1 = ConvBN(cin, cmid, 1, 1, norm=_bn(cmid))
        self.conv2 = ConvBN(cmid, cmid, 3, stride, 1, norm=_bn(cmid))
        self.conv3 = ConvBN(cmid, cout, 1, 1, norm=_bn(cout))

    def forward(self, x):
        sc = self.shortcut(x) if hasattr(self, "shortcut") else x
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        return F.relu(self.conv3(out) + sc)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = ConvBN(3, 64, 7, 2, 3, norm=_bn(64))

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, 3, 2, 1)


class TorchResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = Stem()
        cin, cmid, cout = 64, 64, 256
        for si, n in enumerate([3, 4, 6, 3]):
            blocks = []
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(Bottleneck(cin if bi == 0 else cout, cmid, cout, stride, bi == 0))
            setattr(self, f"res{si + 2}", nn.Sequential(*blocks))
            cin, cmid, cout = cout, cmid * 2, cout * 2

    def forward(self, x):
        x = self.stem(x)
        out = {}
        for name in ["res2", "res3", "res4", "res5"]:
            x = getattr(self, name)(x)
            out[name] = x
        return out


def sine_pe_2d(h, w, num_feats, device):
    ones = torch.ones(1, h, w, device=device)
    y = ones.cumsum(1) / (h + 1e-6) * 2 * math.pi
    x = ones.cumsum(2) / (w + 1e-6) * 2 * math.pi
    dim_t = torch.arange(num_feats, dtype=torch.float32, device=device)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    py = y[..., None] / dim_t
    px = x[..., None] / dim_t
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).flatten(3)
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((py, px), dim=3).permute(0, 3, 1, 2)  # (1, C, H, W)


def sine_pe_3d(t, h, w, num_feats, device):
    ones = torch.ones(1, t, h, w, device=device)
    z = ones.cumsum(1) / (t + 1e-6) * 2 * math.pi
    y = ones.cumsum(2) / (h + 1e-6) * 2 * math.pi
    x = ones.cumsum(3) / (w + 1e-6) * 2 * math.pi
    dim_t = torch.arange(num_feats, dtype=torch.float32, device=device)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    dim_tz = torch.arange(num_feats * 2, dtype=torch.float32, device=device)
    dim_tz = 10000.0 ** (2 * (dim_tz // 2) / (num_feats * 2))
    py = y[..., None] / dim_t
    px = x[..., None] / dim_t
    pz = z[..., None] / dim_tz
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=5).flatten(4)
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=5).flatten(4)
    pz = torch.stack((pz[..., 0::2].sin(), pz[..., 1::2].cos()), dim=5).flatten(4)
    return (torch.cat((py, px), dim=4) + pz).permute(0, 1, 4, 2, 3)  # (1,T,C,H,W)


class TorchMSDA(nn.Module):
    def __init__(self, d_model, n_levels, n_heads, n_points):
        super().__init__()
        self.m, self.l, self.p = n_heads, n_levels, n_points
        self.sampling_offsets = nn.Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(d_model, n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, ref_points, src, shapes):
        b, s, c = src.shape
        m, l, p = self.m, self.l, self.p
        value = self.value_proj(src).view(b, s, m, c // m)
        offsets = self.sampling_offsets(query).view(b, s, m, l, p, 2)
        attn = self.attention_weights(query).view(b, s, m, l * p)
        attn = attn.softmax(-1).view(b, s, m, l, p)
        normalizer = torch.tensor([[w, h] for h, w in shapes], dtype=torch.float32)
        loc = ref_points[None, :, None, :, None, :] + offsets / normalizer[None, None, None, :, None, :]

        # core: per-level grid_sample and weighted sum
        out = 0.0
        start = 0
        samples = []
        for li, (h, w) in enumerate(shapes):
            v = value[:, start : start + h * w].permute(0, 2, 3, 1).reshape(b * m, c // m, h, w)
            g = 2 * loc[:, :, :, li] - 1  # (B, S, M, P, 2)
            g = g.permute(0, 2, 1, 3, 4).reshape(b * m, s, p, 2)
            samples.append(F.grid_sample(v, g, align_corners=False))  # (B*M, D, S, P)
            start += h * w
        stacked = torch.stack(samples, dim=-2)  # (B*M, D, S, L, P)
        wts = attn.permute(0, 2, 1, 3, 4).reshape(b * m, 1, s, l, p)
        out = (stacked * wts).sum((-1, -2))  # (B*M, D, S)
        out = out.view(b, m, c // m, s).permute(0, 3, 1, 2).reshape(b, s, c)
        return self.output_proj(out)


class TorchEncLayer(nn.Module):
    def __init__(self, d_model, d_ffn, n_levels, n_heads, n_points):
        super().__init__()
        self.self_attn = TorchMSDA(d_model, n_levels, n_heads, n_points)
        self.norm1 = nn.LayerNorm(d_model)
        self.linear1 = nn.Linear(d_model, d_ffn)
        self.linear2 = nn.Linear(d_ffn, d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, src, pos, ref, shapes):
        src = self.norm1(src + self.self_attn(src + pos, ref, src, shapes))
        return self.norm2(src + self.linear2(F.relu(self.linear1(src))))


class TorchPixelDecoder(nn.Module):
    """state keys: pixel_decoder.* (input_proj, transformer, adapter_1, ...)"""

    def __init__(self, in_channels, conv_dim, mask_dim, enc_layers, nheads=8):
        super().__init__()
        # in_channels: dict for res2..res5; input_proj order res5, res4, res3
        self.input_proj = nn.ModuleList(
            [
                nn.Sequential(nn.Conv2d(in_channels[n], conv_dim, 1), nn.GroupNorm(32, conv_dim))
                for n in ["res5", "res4", "res3"]
            ]
        )
        enc = nn.Module()
        enc.layers = nn.ModuleList(
            [TorchEncLayer(conv_dim, 1024, 3, nheads, 4) for _ in range(enc_layers)]
        )
        self.transformer = nn.Module()
        self.transformer.encoder = enc
        self.transformer.level_embed = nn.Parameter(torch.randn(3, conv_dim))
        self.adapter_1 = ConvBN(in_channels["res2"], conv_dim, 1, norm=nn.GroupNorm(32, conv_dim))
        self.layer_1 = ConvBN(conv_dim, conv_dim, 3, 1, 1, norm=nn.GroupNorm(32, conv_dim))
        self.mask_features = nn.Conv2d(conv_dim, mask_dim, 1)
        self.conv_dim = conv_dim

    @staticmethod
    def reference_points(shapes):
        pts = []
        for h, w in shapes:
            ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
            xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            pts.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        pts = torch.cat(pts, 0)
        return pts[:, None, :].expand(-1, len(shapes), -1)

    def forward(self, features):
        srcs, poses, shapes = [], [], []
        for i, name in enumerate(["res5", "res4", "res3"]):
            x = features[name].float()
            proj = self.input_proj[i](x)
            b, c, h, w = proj.shape
            shapes.append((h, w))
            srcs.append(proj.flatten(2).transpose(1, 2))
            pe = sine_pe_2d(h, w, self.conv_dim // 2, x.device).flatten(2).transpose(1, 2)
            poses.append(pe + self.transformer.level_embed[i][None, None])
        src = torch.cat(srcs, 1)
        pos = torch.cat(poses, 1)
        ref = self.reference_points(shapes)
        for layer in self.transformer.encoder.layers:
            src = layer(src, pos, ref, shapes)
        outs, start = [], 0
        for (h, w) in shapes:
            outs.append(src[:, start : start + h * w].transpose(1, 2).reshape(-1, self.conv_dim, h, w))
            start += h * w
        lateral = self.adapter_1(features["res2"].float())
        up = F.interpolate(outs[-1], size=lateral.shape[-2:], mode="bilinear", align_corners=False)
        fused = F.relu(self.layer_1(lateral + up))
        return self.mask_features(fused), outs


class TorchVideoDecoder(nn.Module):
    """state keys: predictor.*"""

    def __init__(self, num_classes, hidden_dim, num_queries, nheads, dim_ff, dec_layers, mask_dim):
        super().__init__()
        self.num_heads = nheads
        self.num_layers = dec_layers
        self.query_feat = nn.Embedding(num_queries, hidden_dim)
        self.query_embed = nn.Embedding(num_queries, hidden_dim)
        self.level_embed = nn.Embedding(3, hidden_dim)

        def attn_block(attr):
            m = nn.Module()
            setattr(m, attr, nn.MultiheadAttention(hidden_dim, nheads, dropout=0.0))
            m.norm = nn.LayerNorm(hidden_dim)
            return m

        self.transformer_cross_attention_layers = nn.ModuleList(
            [attn_block("multihead_attn") for _ in range(dec_layers)]
        )
        self.transformer_self_attention_layers = nn.ModuleList(
            [attn_block("self_attn") for _ in range(dec_layers)]
        )
        ffns = []
        for _ in range(dec_layers):
            m = nn.Module()
            m.linear1 = nn.Linear(hidden_dim, dim_ff)
            m.linear2 = nn.Linear(dim_ff, hidden_dim)
            m.norm = nn.LayerNorm(hidden_dim)
            ffns.append(m)
        self.transformer_ffn_layers = nn.ModuleList(ffns)
        self.decoder_norm = nn.LayerNorm(hidden_dim)
        self.class_embed = nn.Linear(hidden_dim, num_classes + 1)
        self.mask_embed = nn.Module()
        self.mask_embed.layers = nn.ModuleList(
            [nn.Linear(hidden_dim, hidden_dim), nn.Linear(hidden_dim, hidden_dim), nn.Linear(hidden_dim, mask_dim)]
        )
        self.hidden_dim = hidden_dim

    def heads(self, output, mask_features, attn_size):
        dec = self.decoder_norm(output).transpose(0, 1)  # (B, Q, C)
        out_cls = self.class_embed(dec)
        x = dec
        for i, l in enumerate(self.mask_embed.layers):
            x = F.relu(l(x)) if i < 2 else l(x)
        out_mask = torch.einsum("bqc,btchw->bqthw", x, mask_features)
        b, q, t, _, _ = out_mask.shape
        am = F.interpolate(out_mask.flatten(0, 1), size=attn_size, mode="bilinear", align_corners=False)
        am = am.view(b, q, t, *attn_size)
        am = (am.sigmoid().flatten(2).unsqueeze(1).repeat(1, self.num_heads, 1, 1).flatten(0, 1) < 0.5).bool()
        return out_cls, out_mask, am.detach()

    def forward(self, x, mask_features):
        # x: list of (B, T, C, h, w); mask_features (B, T, C, H, W)
        b, t = x[0].shape[0], x[0].shape[1]
        srcs, poses, sizes = [], [], []
        for i, feat in enumerate(x):
            _, _, c, h, w = feat.shape
            sizes.append((h, w))
            pe = sine_pe_3d(t, h, w, self.hidden_dim // 2, feat.device)
            pe = pe.expand(b, -1, -1, -1, -1).permute(1, 3, 4, 0, 2).reshape(t * h * w, b, c)
            poses.append(pe)
            src = feat.permute(1, 3, 4, 0, 2).reshape(t * h * w, b, c)
            srcs.append(src + self.level_embed.weight[i][None, None, :])

        query_embed = self.query_embed.weight.unsqueeze(1).repeat(1, b, 1)
        output = self.query_feat.weight.unsqueeze(1).repeat(1, b, 1)

        logits, masks = [], []
        out_cls, out_mask, attn_mask = self.heads(output, mask_features, sizes[0])
        logits.append(out_cls)
        masks.append(out_mask)
        for i in range(self.num_layers):
            li = i % 3
            attn_mask[torch.where(attn_mask.sum(-1) == attn_mask.shape[-1])] = False
            layer = self.transformer_cross_attention_layers[i]
            out2 = layer.multihead_attn(
                output + query_embed, srcs[li] + poses[li], srcs[li], attn_mask=attn_mask
            )[0]
            output = layer.norm(output + out2)
            layer = self.transformer_self_attention_layers[i]
            out2 = layer.self_attn(output + query_embed, output + query_embed, output)[0]
            output = layer.norm(output + out2)
            layer = self.transformer_ffn_layers[i]
            output = layer.norm(output + layer.linear2(F.relu(layer.linear1(output))))
            out_cls, out_mask, attn_mask = self.heads(output, mask_features, sizes[(i + 1) % 3])
            logits.append(out_cls)
            masks.append(out_mask)
        return {"pred_logits": logits[-1], "pred_masks": masks[-1],
                "aux_pred_logits": logits[:-1], "aux_pred_masks": masks[:-1]}


class TorchSemSegHead(nn.Module):
    def __init__(self, in_channels, num_classes, hidden_dim, mask_dim, num_queries,
                 nheads, dim_ff, dec_layers, enc_layers):
        super().__init__()
        self.pixel_decoder = TorchPixelDecoder(in_channels, hidden_dim, mask_dim, enc_layers, nheads)
        self.predictor = TorchVideoDecoder(
            num_classes, hidden_dim, num_queries, nheads, dim_ff, dec_layers, mask_dim
        )

    def forward(self, features, num_frames):
        mask_features, ms = self.pixel_decoder(features)
        bt = mask_features.shape[0]
        b = bt // num_frames
        ms_video = [f.view(b, num_frames, *f.shape[1:]) for f in ms]
        mf = mask_features.view(b, num_frames, *mask_features.shape[1:])
        return self.predictor(ms_video, mf)


class TorchVideoMaskFormer(nn.Module):
    def __init__(self, num_classes=1, hidden_dim=256, mask_dim=256, num_queries=100,
                 nheads=8, dim_ff=2048, dec_layers=9, enc_layers=6):
        super().__init__()
        self.backbone = TorchResNet50()
        self.sem_seg_head = TorchSemSegHead(
            {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048},
            num_classes, hidden_dim, mask_dim, num_queries, nheads, dim_ff,
            dec_layers, enc_layers,
        )

    def forward(self, images, num_frames):
        feats = self.backbone(images)
        return self.sem_seg_head(feats, num_frames)
