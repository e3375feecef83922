"""ResNet backbone in Flax — torchvision-compatible topology, TPU-native.

Reference: common/backbone/resnet/resnet.py (BasicBlock :36, Bottleneck :74,
ResNet.forward returning a {'bodyN': ...} stage dict :175-199,
``stride_in_1x1`` caffe-style option, per-stage dilation, frozen
stages/BatchNorm :217-241). The conv5 ("layer4") stage doubles as the Fast
R-CNN ROI head (ref: common/fast_rcnn.py:74-77), so it is a standalone module
here (``ResNetStage``).

TPU-native choices:
  * NHWC layout (XLA's preferred TPU conv layout),
  * **FrozenBatchNorm**: every shipped config trains with IMAGE_FROZEN_BN
    (ref: vcr/function/config.py:67) and frozen running stats, i.e. BN acts
    as a per-channel affine y = (x - mean) * rsqrt(var + eps) * gamma + beta
    with constant statistics. We implement exactly that (stats live in a
    ``batch_stats``-like param collection marked non-trainable via optimizer
    masks). This removes cross-device stat sync entirely.
  * convs in the compute dtype (bf16) with fp32 params; XLA fuses the frozen
    BN affine into the conv epilogue.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision layer counts (ref: resnet.py:244-415)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """BN with constant statistics and (optionally trainable) affine.

    All parameters live in the 'params' collection; freezing of gamma/beta is
    handled by optimizer masks (training/optim.py), mirroring the reference's
    requires_grad=False (ref: common/fast_rcnn.py:88-100).
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (dim,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (dim,), jnp.float32)
        # precompute the folded affine in fp32, apply in compute dtype
        w = scale / jnp.sqrt(var + self.epsilon)
        b = bias - mean * w
        return x * w.astype(self.dtype) + b.astype(self.dtype)


def conv(features, kernel, stride=1, dilation=1, dtype=jnp.float32, name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], kernel_dilation=(dilation, dilation),
        use_bias=False, dtype=dtype, param_dtype=jnp.float32,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name)


class BasicBlock(nn.Module):
    """ref: resnet.py:36-71."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv(self.planes, 3, self.stride, self.dilation, self.dtype, "conv1")(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, self.dilation, self.dtype, "conv2")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            identity = conv(self.planes, 1, self.stride, 1, self.dtype,
                            "downsample_conv")(x)
            identity = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 with expansion 4 (ref: resnet.py:74-118).

    ``stride_in_1x1`` puts the stride on the first 1x1 conv (caffe/msra
    style) instead of the 3x3 (ref: resnet.py:79-86).
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    stride_in_1x1: bool = False
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        identity = x
        out = conv(self.planes, 1, s1, 1, self.dtype, "conv1")(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, s3, self.dilation, self.dtype, "conv2")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, 1, 1, self.dtype, "conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = conv(self.planes * 4, 1, self.stride, 1, self.dtype,
                            "downsample_conv")(x)
            identity = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    """A stack of residual blocks (= torch ``_make_layer``, ref resnet.py:158-173).

    Standalone so FastRCNN can instantiate the conv5 ROI head from it
    (ref: common/fast_rcnn.py:74-77).
    """

    block: str  # 'basic' | 'bottleneck'
    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    stride_in_1x1: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        expansion = 4 if self.block == "bottleneck" else 1
        out_ch = self.planes * expansion
        need_ds = self.stride != 1 or x.shape[-1] != out_ch
        for i in range(self.blocks):
            kwargs = dict(
                planes=self.planes,
                stride=self.stride if i == 0 else 1,
                dilation=self.dilation,
                downsample=(need_ds if i == 0 else False),
                dtype=self.dtype,
                name=f"block_{i}",
            )
            if self.block == "bottleneck":
                x = Bottleneck(stride_in_1x1=self.stride_in_1x1, **kwargs)(x)
            else:
                x = BasicBlock(**kwargs)(x)
        return x


class ResNetC4Backbone(nn.Module):
    """Stem + stages 1-4, emitting a stride-16 'body4' feature map
    (ref: resnet.py:175-199 with expose_stages=[4], common/fast_rcnn.py:144).
    """

    num_layers: int = 101
    stride_in_1x1: bool = False
    frozen_stages: Sequence[int] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] -> body4: [B, H/16, W/16, 1024].

        Stage numbering follows the reference: stage 1 = stem (conv1+bn1),
        stage k in 2..4 = layer{k-1} (ref: resnet.py:217-236). Param
        freezing itself lives in the optimizer mask (optim.trainable_mask,
        matching the reference's requires_grad=False). The stop_gradient
        here is ONLY a backward-DCE optimization, so it applies solely to
        the contiguous frozen PREFIX {1..k}: a stop after a mid-network
        frozen stage would also cut gradients to trainable stages upstream
        (and leave them weight-decaying with zero grads).
        """
        block, layers = RESNET_SPECS[self.num_layers]
        frozen_set = set(self.frozen_stages)
        frozen = set()
        for s in (1, 2, 3, 4):       # longest contiguous prefix only
            if s in frozen_set:
                frozen.add(s)
            else:
                break

        x = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, "fan_out", "normal"),
                    name="conv1")(images)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if 1 in frozen:
            x = jax.lax.stop_gradient(x)
        x = ResNetStage(block, 64, layers[0], 1, dtype=self.dtype,
                        name="layer1")(x)
        if 2 in frozen:
            x = jax.lax.stop_gradient(x)
        x = ResNetStage(block, 128, layers[1], 2, dtype=self.dtype,
                        stride_in_1x1=self.stride_in_1x1, name="layer2")(x)
        if 3 in frozen:
            x = jax.lax.stop_gradient(x)
        x = ResNetStage(block, 256, layers[2], 2, dtype=self.dtype,
                        stride_in_1x1=self.stride_in_1x1, name="layer3")(x)
        if 4 in frozen:
            x = jax.lax.stop_gradient(x)
        return x  # body4


class ResNetRoIHead(nn.Module):
    """conv5 stage applied to ROI features, + optional avg pool
    (ref: common/fast_rcnn.py:74-84). Input [N, 14, 14, 1024] ->
    [N, 2048] (average_pool) or [N, 7or14, ., 2048]."""

    num_layers: int = 101
    c5_dilated: bool = False
    stride_in_1x1: bool = False
    average_pool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block, layers = RESNET_SPECS[self.num_layers]
        # the reference builds the ROI head with blocks=3 for EVERY depth
        # (common/fast_rcnn.py:74-77 `_make_layer(..., blocks=3, ...)`),
        # not the backbone's own layer4 count — matters for resnet18/34
        x = ResNetStage(
            block, 512, 3,
            stride=1 if self.c5_dilated else 2,
            dilation=2 if self.c5_dilated else 1,
            stride_in_1x1=self.stride_in_1x1,
            dtype=self.dtype, name="layer4")(x)
        if self.average_pool:
            # AvgPool2d(7 or 14, stride=1) over the full map == global mean
            x = jnp.mean(x.astype(jnp.float32), axis=(-3, -2))
        return x
