"""Typed configuration tree — the framework's equivalent of the reference's
`Parameters` / `ModelParameters` objects (/root/reference/evaluate.py:26-89,
/root/reference/train.py:20-78), including backbone autodetection from
checkpoint shapes (evaluate.py:36-44) and the reference's `--fast` iteration
schedule (which the reference CLI defines but never wires through — we wire it,
see SURVEY.md §3.1 note)."""
from dataclasses import dataclass, field
from typing import Tuple

from .models.discriminator import DiscConfig


def eval_aug_params(num_aug: int = 5) -> dict:
    """Eval-time augmentation parameter selections
    (/root/reference/evaluate.py:53-75)."""
    return dict(
        num_aug=num_aug,
        min_px_count=1,
        fg_aug_params=dict(
            rotation=[5, -5, 10, -10, 20, -20, 30, -30, 45, -45],
            fliplr=[False, False, False, False, True],
            scale=[0.5, 0.7, 1.0, 1.5, 2.0, 2.5],
            skew=[(0.0, 0.0), (0.0, 0.0), (0.1, 0.1)],
            blur_size=[0.0, 0.0, 0.0, 2.0],
            blur_angle=[0, 45, 90, 135],
        ),
        bg_aug_params=dict(
            location=[(0.5, 0.5)],
            rotation=[0, 0, 0],
            fliplr=[False],
            scale=[1.0, 1.0, 1.2],
            skew=[(0.0, 0.0)],
            blur_size=[0.0, 0.0, 1.0, 2.0, 5.0],
            blur_angle=[0, 45, 90, 135],
        ),
    )


def train_aug_params(num_aug: int = 15) -> dict:
    """Training-time augmentation selections (/root/reference/train.py:34-56;
    identical lists to eval)."""
    return eval_aug_params(num_aug)


@dataclass(frozen=True)
class TrackerConfig:
    """Inference configuration (the reference's `Parameters`)."""
    feature_extractor: str = "resnet101"
    num_aug: int = 5
    disc: DiscConfig = field(default_factory=DiscConfig)
    refnet_layers: Tuple[str, ...] = ("layer5", "layer4", "layer3", "layer2")
    refnet_channels: int = 64
    refnet_use_bn: bool = True
    aug_params: dict = field(default_factory=eval_aug_params)
    compute_dtype: str = "float32"  # 'bfloat16' on TPU for the backbone/refiner
    # Multi-layer target models (legacy stack capability,
    # /root/reference/ytvos_validation/discriminator.py:104-157): one
    # discriminator per named layer, score maps concatenated in the decoder.
    # Empty tuple = single-layer via disc.layer (the shipped configuration).
    disc_layers: Tuple[str, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "aug_params", dict(self.aug_params))


def autodetect_arch(refiner_state_dict) -> str:
    """Backbone from the refiner checkpoint's layer4 reduce conv input width
    (reference evaluate.py:36-44). Accepts torch-format dicts (O,I,H,W) keyed
    'refiner.TSE.layer4.reduce.0.weight'."""
    w = refiner_state_dict["refiner.TSE.layer4.reduce.0.weight"]
    in_channels = w.shape[1]
    if in_channels == 1024:
        return "resnet101"
    if in_channels == 256:
        return "resnet18"
    raise ValueError(f"Cannot autodetect backbone from {in_channels} input channels")


def eval_config(arch: str, fast: bool = False, num_aug: int = 5,
                compute_dtype: str = "float32") -> TrackerConfig:
    """The reference eval settings (evaluate.py:26-89). `fast` selects the
    reduced schedule (5,10,10,10)/(5,) — properly wired, unlike the
    reference's CLI flag."""
    from .models.resnet import resnet_out_channels

    init_iters = (5, 10, 10, 10) if fast else (5, 10, 10, 10, 10)
    update_iters = (5,) if fast else (10,)
    disc = DiscConfig(
        in_channels=resnet_out_channels(arch)["layer4"],
        c_channels=96,
        out_channels=1,
        init_iters=init_iters,
        update_iters=update_iters,
        memory_size=80,
        train_skipping=8,
        learning_rate=0.1,
        filter_reg=(1e-4, 1e-2),
        precond=(1e-4, 1e-2),
        precond_lr=0.1,
        cg_forgetting_rate=750,
        pixel_weighting_method="hinge",
        pixel_weighting_tf=0.1,
        layer="layer4",
    )
    return TrackerConfig(
        feature_extractor=arch,
        num_aug=num_aug,
        disc=disc,
        aug_params=eval_aug_params(num_aug),
        compute_dtype=compute_dtype,
    )
