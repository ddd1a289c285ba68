"""YOLOv11-compatible detector in JAX/flax.

TPU-native replacement for the reference's TensorRT game-piece inference
(ModelInference.h:31-186 deserializes a YOLOv11 .engine and runs enqueueV3).
Instead of a serialized CUDA engine, the model is a flax module whose
architecture matches Ultralytics YOLO11 (n/s/m scales), so trained
checkpoints can be converted weight-for-weight
(scripts/convert_yolo_weights.py) and the jitted bf16 forward runs on the
MXU. The output contract matches the reference's parser
(yolo_detection.h:125-182): (B, 4 + num_classes, 8400) with xywh box rows in
input-pixel units, class scores sigmoid-activated.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def autopad(k: int) -> int:
    return k // 2


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + SiLU (Ultralytics Conv)."""
    out_ch: int
    k: int = 1
    s: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (self.k, self.k), (self.s, self.s),
                    padding=autopad(self.k), feature_group_count=self.groups,
                    use_bias=False, dtype=x.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.97, dtype=x.dtype)(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True
    e: float = 0.5
    k: tuple = (3, 3)

    @nn.compact
    def __call__(self, x):
        c_ = int(self.out_ch * self.e)
        y = ConvBN(c_, self.k[0], name="cv1")(x)
        y = ConvBN(self.out_ch, self.k[1], name="cv2")(y)
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class C3k(nn.Module):
    """CSP bottleneck with 3 convs (kernel-size-3 bottlenecks)."""
    out_ch: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x):
        c_ = int(self.out_ch * self.e)
        a = ConvBN(c_, 1, name="cv1")(x)
        b = ConvBN(c_, 1, name="cv2")(x)
        for j in range(self.n):
            a = Bottleneck(c_, True, 1.0, (3, 3), name=f"m{j}")(a)
        return ConvBN(self.out_ch, 1,
                      name="cv3")(jnp.concatenate([a, b], -1))


class C3k2(nn.Module):
    """Ultralytics v11 C3k2: fast CSP with 2 convs and n inner blocks."""
    out_ch: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x):
        c_ = int(self.out_ch * self.e)
        y = ConvBN(2 * c_, 1, name="cv1")(x)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        cur = y2
        for j in range(self.n):
            if self.c3k:
                cur = C3k(c_, 2, name=f"m{j}")(cur)
            else:
                cur = Bottleneck(c_, True, 0.5, (3, 3), name=f"m{j}")(cur)
            outs.append(cur)
        return ConvBN(self.out_ch, 1,
                      name="cv2")(jnp.concatenate(outs, -1))


class SPPF(nn.Module):
    out_ch: int
    k: int = 5

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        x = ConvBN(c_, 1, name="cv1")(x)
        outs = [x]
        y = x
        for _ in range(3):
            y = nn.max_pool(y, (self.k, self.k), strides=(1, 1),
                            padding=((self.k // 2,) * 2, (self.k // 2,) * 2))
            outs.append(y)
        return ConvBN(self.out_ch, 1,
                      name="cv2")(jnp.concatenate(outs, -1))


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = head_dim // 2
        nh = self.num_heads
        qkv = ConvBN(nh * (key_dim * 2 + head_dim), 1, act=False,
                     name="qkv")(x)
        qkv = qkv.reshape(b, n, nh, key_dim * 2 + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) / math.sqrt(key_dim)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, h, w, self.dim)
        vr = v.reshape(b, h, w, nh * head_dim)
        out = out + ConvBN(self.dim, 3, groups=self.dim, act=False,
                           name="pe")(vr)
        return ConvBN(self.dim, 1, act=False, name="proj")(out)


class PSABlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        x = x + Attention(self.dim, self.num_heads, name="attn")(x)
        y = ConvBN(self.dim * 2, 1, name="ffn0")(x)
        y = ConvBN(self.dim, 1, act=False, name="ffn1")(y)
        return x + y


class C2PSA(nn.Module):
    out_ch: int
    n: int = 1

    @nn.compact
    def __call__(self, x):
        c_ = self.out_ch // 2
        y = ConvBN(2 * c_, 1, name="cv1")(x)
        a, b_ = jnp.split(y, 2, axis=-1)
        for j in range(self.n):
            b_ = PSABlock(c_, max(1, c_ // 64), name=f"m{j}")(b_)
        return ConvBN(self.out_ch, 1,
                      name="cv2")(jnp.concatenate([a, b_], -1))


@dataclasses.dataclass(frozen=True)
class YoloScale:
    depth: float
    width: float
    max_channels: int


SCALES = {
    "n": YoloScale(0.50, 0.25, 1024),
    "s": YoloScale(0.50, 0.50, 1024),
    "m": YoloScale(0.50, 1.00, 512),
}


class YOLOv11(nn.Module):
    """Ultralytics YOLO11 detection model (inference graph).

    Input (B, H, W, 3) float in [0,1]; output (B, 4 + nc, anchors) —
    identical tensor contract to the reference's engine output
    (yolo_detection.h:148-156 reads [1, 4+C, P])."""
    num_classes: int = 1
    scale: str = "n"
    reg_max: int = 16

    def ch(self, c: int) -> int:
        s = SCALES[self.scale]
        return int(math.ceil(min(c, s.max_channels) * s.width / 8) * 8)

    def depth(self, n: int) -> int:
        return max(1, round(n * SCALES[self.scale].depth))

    @nn.compact
    def __call__(self, x):
        ch = self.ch
        d = self.depth
        c3k = self.scale in ("m", "l", "x")
        # backbone — module names are the Ultralytics layer indices
        # (model.0, model.1, ...) so weight conversion is a pure name map
        x = ConvBN(ch(64), 3, 2, name="m0")(x)              # P1
        x = ConvBN(ch(128), 3, 2, name="m1")(x)             # P2
        x = C3k2(ch(256), d(2), c3k, 0.25, name="m2")(x)
        x = ConvBN(ch(256), 3, 2, name="m3")(x)             # P3
        p3 = C3k2(ch(512), d(2), c3k, 0.25, name="m4")(x)
        x = ConvBN(ch(512), 3, 2, name="m5")(p3)            # P4
        p4 = C3k2(ch(512), d(2), True, name="m6")(x)
        x = ConvBN(ch(1024), 3, 2, name="m7")(p4)           # P5
        x = C3k2(ch(1024), d(2), True, name="m8")(x)
        x = SPPF(ch(1024), 5, name="m9")(x)
        p5 = C2PSA(ch(1024), d(2), name="m10")(x)

        # head (FPN/PAN)
        u = jax.image.resize(p5, (p5.shape[0], p5.shape[1] * 2,
                                  p5.shape[2] * 2, p5.shape[3]), "nearest")
        h4 = C3k2(ch(512), d(2), c3k,
                  name="m13")(jnp.concatenate([u, p4], -1))
        u = jax.image.resize(h4, (h4.shape[0], h4.shape[1] * 2,
                                  h4.shape[2] * 2, h4.shape[3]), "nearest")
        h3 = C3k2(ch(256), d(2), c3k,
                  name="m16")(jnp.concatenate([u, p3], -1))
        dwn = ConvBN(ch(256), 3, 2, name="m17")(h3)
        h4b = C3k2(ch(512), d(2), c3k,
                   name="m19")(jnp.concatenate([dwn, h4], -1))
        dwn = ConvBN(ch(512), 3, 2, name="m20")(h4b)
        h5 = C3k2(ch(1024), d(2), True,
                  name="m22")(jnp.concatenate([dwn, p5], -1))

        # detect head with DFL
        feats = [h3, h4b, h5]
        strides = [8, 16, 32]
        box_outs, cls_outs, anchors, stride_arr = [], [], [], []
        c2 = max(16, ch(256) // 4, self.reg_max * 4)
        c3 = max(ch(256), min(self.num_classes, 100))
        for i, (f, s) in enumerate(zip(feats, strides)):
            # box branch (Ultralytics Detect.cv2[i]): Conv3, Conv3, 1x1
            bx = ConvBN(c2, 3, name=f"cv2_{i}_0")(f)
            bx = ConvBN(c2, 3, name=f"cv2_{i}_1")(bx)
            bx = nn.Conv(4 * self.reg_max, (1, 1), name=f"cv2_{i}_2")(bx)
            # cls branch (Detect.cv3[i]): two depthwise-separable stages
            # (DWConv3 + 1x1) then the scoring 1x1 — layer-for-layer the
            # Ultralytics structure so checkpoints convert exactly
            cl = ConvBN(f.shape[-1], 3, groups=f.shape[-1],
                        name=f"cv3_{i}_0_0")(f)
            cl = ConvBN(c3, 1, name=f"cv3_{i}_0_1")(cl)
            cl = ConvBN(c3, 3, groups=c3, name=f"cv3_{i}_1_0")(cl)
            cl = ConvBN(c3, 1, name=f"cv3_{i}_1_1")(cl)
            cl = nn.Conv(self.num_classes, (1, 1), name=f"cv3_{i}_2")(cl)
            hgt, wid = f.shape[1], f.shape[2]
            box_outs.append(bx.reshape(bx.shape[0], -1, 4 * self.reg_max))
            cls_outs.append(cl.reshape(cl.shape[0], -1, self.num_classes))
            yy, xx = jnp.meshgrid(jnp.arange(hgt, dtype=jnp.float32),
                                  jnp.arange(wid, dtype=jnp.float32),
                                  indexing="ij")
            anchors.append(jnp.stack([xx.ravel() + 0.5, yy.ravel() + 0.5],
                                     -1))
            stride_arr.append(jnp.full((hgt * wid,), float(s), jnp.float32))
        box = jnp.concatenate(box_outs, 1)        # (B, A, 4*reg_max)
        cls = jnp.concatenate(cls_outs, 1)        # (B, A, nc)
        anc = jnp.concatenate(anchors, 0)         # (A, 2)
        strd = jnp.concatenate(stride_arr, 0)     # (A,)

        # DFL: distribution -> distances
        bdist = box.reshape(box.shape[0], box.shape[1], 4, self.reg_max)
        bdist = jax.nn.softmax(bdist.astype(jnp.float32), -1)
        proj = jnp.arange(self.reg_max, dtype=jnp.float32)
        dist = (bdist * proj).sum(-1)             # (B, A, 4) l,t,r,b
        x1y1 = anc[None] - dist[..., 0:2]
        x2y2 = anc[None] + dist[..., 2:4]
        cxy = (x1y1 + x2y2) / 2 * strd[None, :, None]
        wh = (x2y2 - x1y1) * strd[None, :, None]
        out = jnp.concatenate(
            [cxy, wh, jax.nn.sigmoid(cls.astype(jnp.float32))], -1)
        return out.transpose(0, 2, 1)             # (B, 4+nc, A)


def create_model(num_classes: int = 1, scale: str = "n",
                 img_size: int = 640, seed: int = 0,
                 dtype=jnp.bfloat16):
    """Build model + random-init params (weight converter can overwrite)."""
    model = YOLOv11(num_classes=num_classes, scale=scale)
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, img_size, img_size, 3), dtype)
    variables = model.init(rng, dummy)
    return model, variables
