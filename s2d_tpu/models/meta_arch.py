"""Video MaskFormer meta-architecture (backbone -> pixel decoder -> decoder).

The single network used both standalone (reference `VideoMaskFormer`,
`/root/reference/model_training/mask2former_video/video_maskformer_model.py`)
and twice — student + teacher parameter trees — for KD
(`kd_video_maskformer_model.py:94-99`, where student/teacher are
`nn.Sequential(backbone, sem_seg_head)` clones). In JAX the student/teacher
split is a property of the train step (two parameter pytrees over one
module), not of the module itself, so there is no separate KD meta-arch
class; see train/trainer.py.

Input convention: images are already normalized and padded to
size_divisibility, shaped (B, T, H, W, 3) channels-last.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config
from .pixel_decoder import MSDeformAttnPixelDecoder
from .resnet import ResNet
from .transformer_decoder import VideoMaskedTransformerDecoder


class VideoMaskFormer(nn.Module):
    """Flagship model: clip in, per-query class logits + mask logits out."""

    num_classes: int = 1
    hidden_dim: int = 256
    mask_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 10  # config value; decoder runs dec_layers - 1 rounds
    transformer_enc_layers: int = 6
    enc_dropout: float = 0.0
    backbone_type: str = "resnet"  # "resnet" | "swin"
    backbone_depth: int = 50
    swin_embed_dim: int = 96
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    swin_num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    swin_window: int = 7
    msda_impl: str = "xla"
    flash_cross_attention: bool = False  # Pallas flash decoder attn (eval)
    grad_checkpoint: bool = False  # remat encoder layers (training memory)
    compute_dtype: Any = jnp.float32
    # legacy (MaskFormer-v1) alternatives, cfg PIXEL_DECODER_NAME /
    # TRANSFORMER_DECODER_NAME (reference mask_former_head.py:118-132)
    pixel_decoder_type: str = "msdeformattn"  # | "fpn" | "transformer_encoder"
    decoder_type: str = "mask2former"  # | "maskformer_v1"

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        deterministic: bool = True,
        frame_valid: jnp.ndarray | None = None,  # (T,) bool; False = pad
    ) -> Dict[str, jnp.ndarray]:
        """images: (B, T, H, W, 3) normalized, padded. Returns prediction dict
        with pred_logits (B, Q, K+1), pred_masks (B, Q, T, H/4, W/4) and
        per-layer aux predictions."""
        b, t, h, w, _ = images.shape
        frames = images.reshape(b * t, h, w, 3).astype(self.compute_dtype)

        if self.backbone_type == "swin":
            from .swin import SwinTransformer

            features = SwinTransformer(
                embed_dim=self.swin_embed_dim,
                depths=self.swin_depths,
                num_heads=self.swin_num_heads,
                window=self.swin_window,
                name="backbone",
            )(frames)
        else:
            features = ResNet(
                depth=self.backbone_depth,
                out_features=("res2", "res3", "res4", "res5"),
                name="backbone",
            )(frames)

        if self.pixel_decoder_type == "fpn":
            from .legacy import BasePixelDecoder

            mask_features, ms_feats = BasePixelDecoder(
                conv_dim=self.hidden_dim, mask_dim=self.mask_dim,
                name="pixel_decoder",
            )(features, deterministic=deterministic)
        elif self.pixel_decoder_type == "transformer_encoder":
            from .legacy import TransformerEncoderPixelDecoder

            mask_features, ms_feats = TransformerEncoderPixelDecoder(
                conv_dim=self.hidden_dim, mask_dim=self.mask_dim,
                enc_layers=self.transformer_enc_layers, nheads=self.nheads,
                dim_feedforward=self.dim_feedforward, name="pixel_decoder",
            )(features, deterministic=deterministic)
        else:
            mask_features, ms_feats = MSDeformAttnPixelDecoder(
                conv_dim=self.hidden_dim,
                mask_dim=self.mask_dim,
                transformer_enc_layers=self.transformer_enc_layers,
                transformer_nheads=self.nheads,
                dropout=self.enc_dropout,
                msda_impl=self.msda_impl,
                remat=self.grad_checkpoint,
                name="pixel_decoder",
            )(features, deterministic=deterministic)

        # fp32 pixel-decoder island ends here; decoder runs in compute dtype
        ms_video = [
            f.astype(self.compute_dtype).reshape(b, t, *f.shape[1:]) for f in ms_feats
        ]
        mask_features = mask_features.astype(self.compute_dtype)
        mask_features = mask_features.reshape(b, t, *mask_features.shape[1:])

        if self.decoder_type == "maskformer_v1":
            from .legacy import StandardTransformerDecoder

            return StandardTransformerDecoder(
                num_classes=self.num_classes,
                hidden_dim=self.hidden_dim,
                num_queries=self.num_queries,
                nheads=self.nheads,
                dim_feedforward=self.dim_feedforward,
                dec_layers=max(self.dec_layers - 1, 1),
                mask_dim=self.mask_dim,
                name="predictor",
            )(ms_video, mask_features)

        out = VideoMaskedTransformerDecoder(
            num_classes=self.num_classes,
            hidden_dim=self.hidden_dim,
            num_queries=self.num_queries,
            nheads=self.nheads,
            dim_feedforward=self.dim_feedforward,
            dec_layers=self.dec_layers - 1,
            mask_dim=self.mask_dim,
            flash_cross_attention=self.flash_cross_attention,
            name="predictor",
        )(ms_video, mask_features, frame_valid=frame_valid)
        return out


def build_model(
    cfg: Config,
    msda_impl: str | None = None,
    compute_dtype=None,
    flash_cross_attention: bool = False,
    grad_checkpoint: bool = False,
) -> VideoMaskFormer:
    mf = cfg.model.mask_former
    is_swin = "swin" in cfg.model.backbone.name.lower()
    pd_name = cfg.model.sem_seg_head.pixel_decoder_name
    pixel_decoder_type = {
        "BasePixelDecoder": "fpn",
        "TransformerEncoderPixelDecoder": "transformer_encoder",
    }.get(pd_name, "msdeformattn")
    decoder_type = (
        "maskformer_v1"
        if mf.transformer_decoder_name == "StandardTransformerDecoder"
        or mf.transformer_in_feature == "transformer_encoder"
        else "mask2former"
    )
    return VideoMaskFormer(
        pixel_decoder_type=pixel_decoder_type,
        decoder_type=decoder_type,
        grad_checkpoint=grad_checkpoint,
        flash_cross_attention=flash_cross_attention,
        backbone_type="swin" if is_swin else "resnet",
        swin_embed_dim=cfg.model.swin.embed_dim,
        swin_depths=tuple(cfg.model.swin.depths),
        swin_num_heads=tuple(cfg.model.swin.num_heads),
        swin_window=cfg.model.swin.window_size,
        num_classes=cfg.model.sem_seg_head.num_classes,
        hidden_dim=mf.hidden_dim,
        mask_dim=cfg.model.sem_seg_head.mask_dim,
        num_queries=mf.num_object_queries,
        nheads=mf.nheads,
        dim_feedforward=mf.dim_feedforward,
        dec_layers=mf.dec_layers,
        transformer_enc_layers=cfg.model.sem_seg_head.transformer_enc_layers,
        enc_dropout=mf.dropout,
        backbone_depth=cfg.model.resnets.depth,
        msda_impl=msda_impl if msda_impl is not None else "xla",
        compute_dtype=compute_dtype
        if compute_dtype is not None
        else (jnp.bfloat16 if cfg.solver.amp.enabled else jnp.float32),
    )


def preprocess_clip(
    frames: jnp.ndarray,
    pixel_mean: Sequence[float],
    pixel_std: Sequence[float],
    size_divisibility: int = 32,
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Normalize (T, H, W, 3) uint8/float RGB frames and zero-pad H, W up to
    the divisibility, exactly as the reference's ImageList.from_tensors.

    Returns (1, T, H_pad, W_pad, 3) and the unpadded (H, W)."""
    t, h, w, _ = frames.shape
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    # transfer in the caller's dtype (eval frames are uint8 — 4x less
    # upload than a host-side f32 cast) and normalize on device
    x = (jnp.asarray(frames).astype(jnp.float32) - mean) / std
    pad_h = -h % size_divisibility
    pad_w = -w % size_divisibility
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return x[None], (h, w)
