"""PyTorch checkpoint -> flax parameter pytree conversion.

Handles the reference's three on-disk layouts (see `/root/reference/
model_training/mask2former_video/engine/checkpoint.py:161-286`):

  1. plain VideoMaskFormer: keys `backbone.*` / `sem_seg_head.*`
  2. KD student/teacher: `student.0.*` (backbone), `student.1.*`
     (sem_seg_head), `teacher.0.*`, `teacher.1.*`
  3. d2 .pkl zoo checkpoints (dict with "model" / numpy arrays)

Weight-layout conversions torch -> flax:
  * Linear (out,in) -> Dense kernel (in,out): transpose
  * Conv OIHW -> HWIO: transpose(2,3,1,0)
  * FrozenBatchNorm2d running stats folded into affine (scale, bias) with
    eps=1e-5 (d2 FrozenBatchNorm2d semantics)
  * torch MultiheadAttention in_proj/out_proj are kept in torch layout (the
    flax module in models/attention.py consumes them untransposed)

The converter is table-driven over key patterns, raises on any unconsumed
model key, and returns a nested dict matching VideoMaskFormer.init.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

BN_EPS = 1e-5


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (imported lazily: torch is a conversion-time-only dep)
    return v.detach().cpu().numpy()


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pkl checkpoint into a flat {key: np.ndarray} dict."""
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, Mapping) and "model" in data:
        data = data["model"]
    return {k: _to_numpy(v) for k, v in data.items() if not isinstance(v, (int, float, str))}


def detect_layout(state: Mapping[str, np.ndarray]) -> str:
    if any(k.startswith("student.0.") for k in state):
        return "student_teacher"
    if any(k.startswith("backbone.") for k in state):
        return "plain"
    raise ValueError("Unrecognized checkpoint layout")


def extract_network(state: Mapping[str, np.ndarray], which: str = "teacher") -> Dict[str, np.ndarray]:
    """Extract one network's weights as plain backbone./sem_seg_head. keys."""
    layout = detect_layout(state)
    if layout == "plain":
        return {k: v for k, v in state.items() if k.startswith(("backbone.", "sem_seg_head."))}
    assert which in ("student", "teacher")
    out = {}
    for k, v in state.items():
        if k.startswith(f"{which}.0."):
            out["backbone." + k[len(which) + 3 :]] = v
        elif k.startswith(f"{which}.1."):
            out["sem_seg_head." + k[len(which) + 3 :]] = v
    return out


def _set(tree: dict, path: list, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _fold_bn(state, prefix):
    w = state[prefix + ".weight"].astype(np.float64)
    b = state[prefix + ".bias"].astype(np.float64)
    mean = state[prefix + ".running_mean"].astype(np.float64)
    var = state[prefix + ".running_var"].astype(np.float64)
    scale = w / np.sqrt(var + BN_EPS)
    bias = b - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _conv(state, key):
    return np.ascontiguousarray(state[key].transpose(2, 3, 1, 0))


def _dense(state, key):
    return np.ascontiguousarray(state[key].T)




def _convert_resnet_backbone(
    state: Mapping[str, np.ndarray], consumed: set
) -> Dict[str, Any]:
    """d2 R50 keys (backbone.stem.conv1 / backbone.resN.i.convM[.norm],
    shortcut) -> ResNet backbone params, BN folded."""

    def take_conv(key):
        consumed.add(key)
        return _conv(state, key)

    def take_bn(prefix):
        for suffix in (".weight", ".bias", ".running_mean", ".running_var"):
            consumed.add(prefix + suffix)
        return _fold_bn(state, prefix)

    bb: Dict[str, Any] = {}
    bb["stem_conv1"] = {"kernel": take_conv("backbone.stem.conv1.weight")}
    s, b = take_bn("backbone.stem.conv1.norm")
    bb["stem_norm1"] = {"scale": s, "bias": b}
    # stage depths from the checkpoint itself (R50 {3,4,6,3}, R101
    # {3,4,23,3}, ...) — the graft template must be built at the matching
    # MODEL.RESNETS.DEPTH; basic-block nets (R18/34, no conv3) are
    # rejected with a clear error instead of a KeyError mid-conversion
    import re

    stage_blocks = {
        stage: 1 + max(
            (int(m.group(1)) for k in state
             for m in [re.match(
                 rf"backbone\.{stage}\.(\d+)\.conv1\.weight$", k)]
             if m),
            default=-1,
        )
        for stage in ("res2", "res3", "res4", "res5")
    }
    if "backbone.res2.0.conv3.weight" not in state:
        raise ValueError(
            "only bottleneck ResNets (50/101/152) are supported: the "
            "checkpoint has no res2.0.conv3 (R18/34 basic blocks)"
        )
    for stage, nblocks in stage_blocks.items():
        for i in range(nblocks):
            blk: Dict[str, Any] = {}
            tprefix = f"backbone.{stage}.{i}"
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {"kernel": take_conv(f"{tprefix}.conv{ci}.weight")}
                s, b = take_bn(f"{tprefix}.conv{ci}.norm")
                blk[f"norm{ci}"] = {"scale": s, "bias": b}
            if f"{tprefix}.shortcut.weight" in state:
                blk["shortcut"] = {"kernel": take_conv(f"{tprefix}.shortcut.weight")}
                s, b = take_bn(f"{tprefix}.shortcut.norm")
                blk["shortcut_norm"] = {"scale": s, "bias": b}
            bb[f"{stage}_block{i}"] = blk
    return bb


def convert_reference_network(
    state: Mapping[str, np.ndarray], dec_layers: int = 9, enc_layers: int = 6
) -> Dict[str, Any]:
    """Convert plain backbone./sem_seg_head. keys -> VideoMaskFormer params."""
    p: Dict[str, Any] = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return state[key]

    def take_conv(key):
        consumed.add(key)
        return _conv(state, key)

    def take_dense(key):
        consumed.add(key)
        return _dense(state, key)

    def take_bn(prefix):
        for suffix in (".weight", ".bias", ".running_mean", ".running_var"):
            consumed.add(prefix + suffix)
        return _fold_bn(state, prefix)

    # ---- backbone (ResNet or Swin, detected by key signature) ----
    if "backbone.patch_embed.proj.weight" in state:
        p["backbone"] = _convert_swin_backbone(state, consumed)
    else:
        p["backbone"] = _convert_resnet_backbone(state, consumed)

    # ---- pixel decoder ----
    pd: Dict[str, Any] = {}
    for idx in range(3):
        tp = f"sem_seg_head.pixel_decoder.input_proj.{idx}"
        pd[f"input_proj{idx}_conv"] = {
            "kernel": take_conv(f"{tp}.0.weight"),
            "bias": take(f"{tp}.0.bias"),
        }
        pd[f"input_proj{idx}_gn"] = {
            "scale": take(f"{tp}.1.weight"),
            "bias": take(f"{tp}.1.bias"),
        }
    pd["level_embed"] = take("sem_seg_head.pixel_decoder.transformer.level_embed")
    for i in range(enc_layers):
        tp = f"sem_seg_head.pixel_decoder.transformer.encoder.layers.{i}"
        layer: Dict[str, Any] = {"self_attn": {}}
        for lin in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
            layer["self_attn"][lin] = {
                "kernel": take_dense(f"{tp}.self_attn.{lin}.weight"),
                "bias": take(f"{tp}.self_attn.{lin}.bias"),
            }
        for norm, mine in (("norm1", "norm1"), ("norm2", "norm2")):
            layer[mine] = {
                "scale": take(f"{tp}.{norm}.weight"),
                "bias": take(f"{tp}.{norm}.bias"),
            }
        for lin in ("linear1", "linear2"):
            layer[lin] = {
                "kernel": take_dense(f"{tp}.{lin}.weight"),
                "bias": take(f"{tp}.{lin}.bias"),
            }
        pd[f"encoder_layer{i}"] = layer
    pd["adapter1_conv"] = {"kernel": take_conv("sem_seg_head.pixel_decoder.adapter_1.weight")}
    pd["adapter1_gn"] = {
        "scale": take("sem_seg_head.pixel_decoder.adapter_1.norm.weight"),
        "bias": take("sem_seg_head.pixel_decoder.adapter_1.norm.bias"),
    }
    pd["layer1_conv"] = {"kernel": take_conv("sem_seg_head.pixel_decoder.layer_1.weight")}
    pd["layer1_gn"] = {
        "scale": take("sem_seg_head.pixel_decoder.layer_1.norm.weight"),
        "bias": take("sem_seg_head.pixel_decoder.layer_1.norm.bias"),
    }
    pd["mask_features"] = {
        "kernel": take_conv("sem_seg_head.pixel_decoder.mask_features.weight"),
        "bias": take("sem_seg_head.pixel_decoder.mask_features.bias"),
    }
    p["pixel_decoder"] = pd

    # ---- transformer decoder (predictor) ----
    pr: Dict[str, Any] = {}
    pr["query_feat"] = take("sem_seg_head.predictor.query_feat.weight")
    pr["query_embed"] = take("sem_seg_head.predictor.query_embed.weight")
    pr["level_embed"] = take("sem_seg_head.predictor.level_embed.weight")
    for i in range(dec_layers):
        ca = f"sem_seg_head.predictor.transformer_cross_attention_layers.{i}"
        sa = f"sem_seg_head.predictor.transformer_self_attention_layers.{i}"
        ff = f"sem_seg_head.predictor.transformer_ffn_layers.{i}"
        pr[f"layer{i}_cross_attn"] = {
            "in_proj_weight": take(f"{ca}.multihead_attn.in_proj_weight"),
            "in_proj_bias": take(f"{ca}.multihead_attn.in_proj_bias"),
            "out_proj_weight": take(f"{ca}.multihead_attn.out_proj.weight"),
            "out_proj_bias": take(f"{ca}.multihead_attn.out_proj.bias"),
        }
        pr[f"layer{i}_cross_norm"] = {
            "scale": take(f"{ca}.norm.weight"),
            "bias": take(f"{ca}.norm.bias"),
        }
        pr[f"layer{i}_self_attn"] = {
            "in_proj_weight": take(f"{sa}.self_attn.in_proj_weight"),
            "in_proj_bias": take(f"{sa}.self_attn.in_proj_bias"),
            "out_proj_weight": take(f"{sa}.self_attn.out_proj.weight"),
            "out_proj_bias": take(f"{sa}.self_attn.out_proj.bias"),
        }
        pr[f"layer{i}_self_norm"] = {
            "scale": take(f"{sa}.norm.weight"),
            "bias": take(f"{sa}.norm.bias"),
        }
        pr[f"layer{i}_ffn"] = {
            "linear1": {
                "kernel": take_dense(f"{ff}.linear1.weight"),
                "bias": take(f"{ff}.linear1.bias"),
            },
            "linear2": {
                "kernel": take_dense(f"{ff}.linear2.weight"),
                "bias": take(f"{ff}.linear2.bias"),
            },
            "norm": {
                "scale": take(f"{ff}.norm.weight"),
                "bias": take(f"{ff}.norm.bias"),
            },
        }
    pr["decoder_norm"] = {
        "scale": take("sem_seg_head.predictor.decoder_norm.weight"),
        "bias": take("sem_seg_head.predictor.decoder_norm.bias"),
    }
    pr["class_embed"] = {
        "kernel": take_dense("sem_seg_head.predictor.class_embed.weight"),
        "bias": take("sem_seg_head.predictor.class_embed.bias"),
    }
    pr["mask_embed"] = {
        f"layer{j}": {
            "kernel": take_dense(f"sem_seg_head.predictor.mask_embed.layers.{j}.weight"),
            "bias": take(f"sem_seg_head.predictor.mask_embed.layers.{j}.bias"),
        }
        for j in range(3)
    }
    p["predictor"] = pr

    leftover = {
        k
        for k in state
        if k not in consumed
        and k.startswith(("backbone.", "sem_seg_head."))
        and "static_query" not in k
        and not k.endswith("num_batches_tracked")
    }
    if leftover:
        raise KeyError(f"Unconsumed checkpoint keys: {sorted(leftover)[:10]} ...")
    return {"params": p}


def _convert_swin_backbone(
    state: Mapping[str, np.ndarray], consumed: set
) -> Dict[str, Any]:
    """d2 Swin keys (backbone.layers.{s}.blocks.{b}.*) -> SwinTransformer
    params (models/swin.py naming)."""

    def take(key):
        consumed.add(key)
        return state[key]

    def take_dense(key):
        consumed.add(key)
        return _dense(state, key)

    bb: Dict[str, Any] = {
        "patch_embed_proj": {
            "kernel": np.ascontiguousarray(
                state["backbone.patch_embed.proj.weight"].transpose(2, 3, 1, 0)
            ),
            "bias": take("backbone.patch_embed.proj.bias"),
        },
        "patch_embed_norm": {
            "scale": take("backbone.patch_embed.norm.weight"),
            "bias": take("backbone.patch_embed.norm.bias"),
        },
    }
    consumed.add("backbone.patch_embed.proj.weight")

    si = 0
    while f"backbone.layers.{si}.blocks.0.norm1.weight" in state:
        bi = 0
        while f"backbone.layers.{si}.blocks.{bi}.norm1.weight" in state:
            tp = f"backbone.layers.{si}.blocks.{bi}"
            consumed.add(f"{tp}.attn.relative_position_index")  # buffer
            bb[f"stage{si}_block{bi}"] = {
                "norm1": {"scale": take(f"{tp}.norm1.weight"), "bias": take(f"{tp}.norm1.bias")},
                "norm2": {"scale": take(f"{tp}.norm2.weight"), "bias": take(f"{tp}.norm2.bias")},
                "attn": {
                    "relative_position_bias_table": take(
                        f"{tp}.attn.relative_position_bias_table"
                    ),
                    "qkv": {
                        "kernel": take_dense(f"{tp}.attn.qkv.weight"),
                        "bias": take(f"{tp}.attn.qkv.bias"),
                    },
                    "proj": {
                        "kernel": take_dense(f"{tp}.attn.proj.weight"),
                        "bias": take(f"{tp}.attn.proj.bias"),
                    },
                },
                "mlp_fc1": {
                    "kernel": take_dense(f"{tp}.mlp.fc1.weight"),
                    "bias": take(f"{tp}.mlp.fc1.bias"),
                },
                "mlp_fc2": {
                    "kernel": take_dense(f"{tp}.mlp.fc2.weight"),
                    "bias": take(f"{tp}.mlp.fc2.bias"),
                },
            }
            bi += 1
        ds = f"backbone.layers.{si}.downsample"
        if f"{ds}.reduction.weight" in state:
            bb[f"downsample{si}"] = {
                "norm": {"scale": take(f"{ds}.norm.weight"), "bias": take(f"{ds}.norm.bias")},
                "reduction": {"kernel": take_dense(f"{ds}.reduction.weight")},
            }
        if f"backbone.norm{si}.weight" in state:
            bb[f"out_norm{si}"] = {
                "scale": take(f"backbone.norm{si}.weight"),
                "bias": take(f"backbone.norm{si}.bias"),
            }
        si += 1
    return bb


def load_reference_model(path: str, which: str = "teacher") -> Dict[str, Any]:
    """One-call loader: .pth/.pkl path -> VideoMaskFormer variables dict."""
    state = load_torch_checkpoint(path)
    return convert_reference_network(extract_network(state, which))


def is_backbone_only(state: Mapping[str, np.ndarray]) -> bool:
    """True for d2-layout backbone pretrain checkpoints (the output of
    tools/convert_pretrained_weights.py / the reference's
    convert-torchvision-to-d2.py + convert-pretrained-swin-model-to-d2.py):
    stem./resN. (R50) or patch_embed./layers. (Swin) keys with no
    sem_seg_head."""
    has_head = any(k.startswith("sem_seg_head.") for k in state)
    bb = any(
        k.startswith(("stem.", "res2.", "patch_embed.", "layers.",
                      "backbone.stem.", "backbone.patch_embed."))
        for k in state
    )
    return bb and not has_head


def _pretrain_skip(key: str) -> bool:
    """Buffers/classifier heads that pretrain checkpoints carry but the
    detection backbone never consumes (d2's matching heuristics skip
    them): BN counters, the ImageNet fc/head, attention buffers, and the
    classifier-side final norm ("backbone.norm.*" exactly — the Swin
    stage norms backbone.norm{0..3} ARE consumed)."""
    return (
        key.endswith(("num_batches_tracked", "attn_mask",
                      "relative_position_index"))
        or key.startswith(("backbone.fc.", "backbone.head.",
                           "backbone.stem.fc."))
        or key in ("backbone.norm.weight", "backbone.norm.bias")
    )


def load_backbone_weights(
    path_or_state, variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Graft a d2-layout BACKBONE pretrain checkpoint (a path, or an
    already-loaded state dict — callers that probed with is_backbone_only
    pass the loaded dict to avoid a second disk read) into `variables`
    (the analog of d2's matching-heuristics load of an ImageNet backbone).
    Converted modules MERGE over the existing backbone subtree, so
    detection-only modules with no pretrain counterpart (e.g. the Swin
    per-stage out_norm{0..3} — ImageNet Swin checkpoints carry only the
    classifier-side final norm) keep their fresh init, exactly as d2's
    matching heuristics leave unmatched model params alone. Raises on
    unconsumed backbone keys."""
    state = (
        load_torch_checkpoint(path_or_state)
        if isinstance(path_or_state, str)
        else dict(path_or_state)
    )
    if not any(k.startswith("backbone.") for k in state):
        state = {f"backbone.{k}": v for k, v in state.items()}
    consumed: set = set()
    if "backbone.patch_embed.proj.weight" in state:
        bb = _convert_swin_backbone(state, consumed)
    else:
        bb = _convert_resnet_backbone(state, consumed)
    leftover = {
        k for k in state if k not in consumed and not _pretrain_skip(k)
    }
    if leftover:
        raise KeyError(
            f"Unconsumed backbone checkpoint keys: {sorted(leftover)[:10]} ..."
        )
    out = {**variables, "params": dict(variables["params"])}
    out["params"]["backbone"] = {**variables["params"]["backbone"], **bb}
    return out
