"""Typed configuration tree for s2d_tpu.

Mirrors the yacs key structure the reference's five run-configs actually use
(`/root/reference/model_training/configs/imagenet_video/*.yaml` +
`mask2former/config.py` + `mask2former_video/config.py`) so those YAML files
load unchanged, but as plain dataclasses: no registry, no string-keyed
CfgNode, field defaults = the reference defaults.

Naming: dataclass fields are lowercase; YAML keys are UPPERCASE and matched
case-insensitively by the loader (`loader.py`).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class BackboneConfig:
    name: str = "build_resnet_backbone"
    freeze_at: int = 0


@dataclass(frozen=True)
class ResNetsConfig:
    depth: int = 50
    stem_out_channels: int = 64
    stride_in_1x1: bool = False
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    norm: str = "FrozenBN"
    res2_out_channels: int = 256


@dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")


@dataclass(frozen=True)
class SemSegHeadConfig:
    name: str = "MaskFormerHead"
    ignore_value: int = 255
    num_classes: int = 1
    loss_weight: float = 1.0
    convs_dim: int = 256
    mask_dim: int = 256
    norm: str = "GN"
    pixel_decoder_name: str = "MSDeformAttnPixelDecoder"
    in_features: Tuple[str, ...] = ("res2", "res3", "res4", "res5")
    deformable_transformer_encoder_in_features: Tuple[str, ...] = (
        "res3",
        "res4",
        "res5",
    )
    common_stride: int = 4
    transformer_enc_layers: int = 6


@dataclass(frozen=True)
class MaskFormerTestConfig:
    semantic_on: bool = False
    instance_on: bool = True
    panoptic_on: bool = False
    overlap_threshold: float = 0.8
    object_mask_threshold: float = 0.8
    use_nms: bool = True
    nms_thresh: float = 0.75
    num_predictions: int = 50
    eval_student: bool = False


@dataclass(frozen=True)
class MaskFormerConfig:
    transformer_decoder_name: str = "VideoMultiScaleMaskedTransformerDecoder"
    transformer_in_feature: str = "multi_scale_pixel_decoder"
    deep_supervision: bool = True
    no_object_weight: float = 0.1
    class_weight: float = 0.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    hidden_dim: int = 256
    num_object_queries: int = 100
    nheads: int = 8
    dropout: float = 0.0
    dim_feedforward: int = 2048
    enc_layers: int = 0
    dec_layers: int = 10
    pre_norm: bool = False
    enforce_input_proj: bool = False
    size_divisibility: int = 32
    train_num_points: int = 160000
    # point count for the MATCHER's cost estimates only (0 = use
    # train_num_points, the reference behavior: matcher.py:252-264 samples
    # the same cfg count). The cost scan is ~300 ms of the 421 ms
    # criterion pair at 160K points and is linear in this count; the
    # assignment only needs cost RANKS, so a smaller count is a
    # beyond-reference opt-in speed lever (convergence A/B before use).
    matcher_num_points: int = 0
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    # criterion point-pool construction: "iid" (the reference's uniform
    # draws, sampled by gathers — criterion.py:292, point_features.py:63)
    # or "lattice" (random-phase jittered lattice, sampled by dense slice
    # blends — see ops/lattice.py; ~22% faster full KD step). Default is
    # iid: the round-4 FULL-SCALE convergence A/B (AB_CONVERGENCE.md
    # "Full scale", 150 steps, 100-query/10-layer/160K-point) has iid
    # beating lattice on both held-out yardsticks at seed 0 (val 43.9 vs
    # 52.7, IoU 0.876 vs 0.840) — lattice stays an opt-in speed lever
    # until it shows a clear quality win.
    point_sampling: str = "iid"
    loss_strategy: str = "masks-only"  # temporal DropLoss on empty frames
    distillation_loss_strategy: str = "masks-only"
    # KD / distillation
    kd_class_weight: float = 0.0
    kd_mask_weight: float = 5.0
    kd_dice_weight: float = 5.0
    kd_weight_scheduler: str = "constant"  # constant | linear | cosine
    kd_min_weight: float = 0.1
    supervised_min_weight: float = 0.1
    kd_weight_decay_start: float = 0.0
    kd_weight_decay_end: float = -1.0
    decay_only_supervised_loss: bool = False
    decay_only_kd_loss: bool = False
    loss_weight_decay_step: float = 0.0
    detach_cls: bool = False
    ema_momentum: float = 0.999
    ema_momentum_schedule: bool = False
    ema_momentum_end: float = 0.999
    ema_momentum_until_step: int = 10000
    num_predictions_distillation: int = 100
    score_threshold_distillation: float = 0.75
    distillation_nms: bool = False
    # matching extras (reference config.py defaults)
    sparse_class_weight: float = 0.0
    entropy_weight: float = 0.0
    no_class_match: bool = False
    mask_droploss: bool = False
    label_droploss: bool = False
    test: MaskFormerTestConfig = field(default_factory=MaskFormerTestConfig)


@dataclass(frozen=True)
class ModelConfig:
    meta_architecture: str = "KDVideoMaskFormer"
    weights: str = ""
    weight_list: Tuple[str, ...] = ()
    pixel_mean: Tuple[float, ...] = (123.675, 116.280, 103.530)
    pixel_std: Tuple[float, ...] = (58.395, 57.120, 57.375)
    mask_on: bool = True
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    resnets: ResNetsConfig = field(default_factory=ResNetsConfig)
    swin: SwinConfig = field(default_factory=SwinConfig)
    sem_seg_head: SemSegHeadConfig = field(default_factory=SemSegHeadConfig)
    mask_former: MaskFormerConfig = field(default_factory=MaskFormerConfig)


@dataclass(frozen=True)
class ClipGradientsConfig:
    enabled: bool = True
    clip_type: str = "full_model"
    clip_value: float = 0.01
    norm_type: float = 2.0


@dataclass(frozen=True)
class AMPConfig:
    enabled: bool = True


@dataclass(frozen=True)
class SolverConfig:
    ims_per_batch: int = 4
    base_lr: float = 1e-4
    steps: Tuple[int, ...] = (4000,)
    max_iter: int = 6000
    warmup_factor: float = 1.0
    warmup_iters: int = 10
    weight_decay: float = 0.05
    optimizer: str = "ADAMW"
    backbone_multiplier: float = 0.1
    accum_iter: int = 1
    gamma: float = 0.1
    lr_scheduler_name: str = "WarmupMultiStepLR"
    reference_world_size: int = 0
    # SOLVER.CHECKPOINT_PERIOD (reference engine/defaults.py:519-565:
    # PeriodicCheckpointer)
    checkpoint_period: int = 5000
    # remat the deformable encoder layers during training (recompute in the
    # backward pass): trades ~1 extra encoder forward for the activation
    # HBM that otherwise OOMs the full R50 KD step on a 16G chip
    grad_checkpoint: bool = True
    clip_gradients: ClipGradientsConfig = field(default_factory=ClipGradientsConfig)
    amp: AMPConfig = field(default_factory=AMPConfig)


@dataclass(frozen=True)
class CropConfig:
    enabled: bool = False
    type: str = "absolute_range"
    size: Tuple[int, ...] = (600, 720)


@dataclass(frozen=True)
class InputConfig:
    min_size_train: Tuple[int, ...] = (360, 480)
    min_size_train_sampling: str = "choice_by_clip"
    max_size_train: int = 1333
    min_size_test: int = 360
    max_size_test: int = 1333
    random_flip: str = "flip_by_clip"
    augmentations: Tuple[str, ...] = ()
    sampling_frame_num: int = 3
    sampling_frame_range: int = 20
    sampling_frame_shuffle: bool = False
    dense_annotation_selection: bool = True
    disentangle_distillation_loader: bool = False
    distillation_dense_annotation_selection: bool = True
    format: str = "RGB"
    crop: CropConfig = field(default_factory=CropConfig)


@dataclass(frozen=True)
class DataLoaderConfig:
    filter_empty_annotations: bool = True
    num_workers: int = 4
    copy_paste: bool = False
    copy_paste_rate: float = 1.0
    visualize_copy_paste: bool = False
    copy_paste_random_num: bool = False
    copy_paste_min_ratio: float = 0.8
    copy_paste_max_ratio: float = 1.0
    copy_paste_densify_sparse: bool = False


@dataclass(frozen=True)
class DatasetsConfig:
    train: Tuple[str, ...] = ("ytvis_2019_train",)
    test: Tuple[str, ...] = ("ytvis_2019_val",)


@dataclass(frozen=True)
class TestConfig:
    eval_period: int = 0
    expected_results: Tuple = ()


@dataclass(frozen=True)
class ParallelConfig:
    """TPU-native additions: device mesh layout (no reference analog —
    replaces torch DDP / detectron2 launch)."""

    data_axis: int = -1  # -1: all devices on the data axis
    model_axis: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    input: InputConfig = field(default_factory=InputConfig)
    dataloader: DataLoaderConfig = field(default_factory=DataLoaderConfig)
    datasets: DatasetsConfig = field(default_factory=DatasetsConfig)
    test: TestConfig = field(default_factory=TestConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    output_dir: str = "OUTPUT/"
    seed: int = -1
    version: int = 2

    def clone(self) -> "Config":
        return dataclasses.replace(self)
