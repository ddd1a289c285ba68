"""Torch reference implementation of the Ultralytics YOLO11 detection graph.

Written to validate scripts/convert_yolo_weights.py without network access
to real checkpoints: module structure, state-dict key names
(model.N.cv1.conv.weight, ...) and inference math mirror the public
Ultralytics architecture (ultralytics/nn/modules + yolo11.yaml), so a
state_dict from this model exercises the converter exactly like a real
YOLO11 checkpoint of the same scale. The reference consumes such
checkpoints as TensorRT engines (ModelInference.h:31-186); we consume them
as converted flax trees.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn


def autopad(k):
    return k // 2


class Conv(nn.Module):
    """Ultralytics Conv: Conv2d(bias=False) + BN(eps=1e-3) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


def DWConv(c1, c2, k=1, s=1, act=True):
    return Conv(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C3k(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(
            Bottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0)
            for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k2(nn.Module):
    """Ultralytics C3k2 (a C2f whose blocks are C3k or Bottleneck)."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut, g) if c3k else
            Bottleneck(self.c, self.c, shortcut, g)
            for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(B, self.num_heads,
                           self.key_dim * 2 + self.head_dim, N).split(
            [self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + \
            self.pe(v.reshape(B, C, H, W))
        return self.proj(x)


class PSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        super().__init__()
        self.attn = Attention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = nn.Sequential(Conv(c, c * 2, 1), Conv(c * 2, c, 1,
                                                         act=False))
        self.add = shortcut

    def forward(self, x):
        x = x + self.attn(x) if self.add else self.attn(x)
        return x + self.ffn(x) if self.add else self.ffn(x)


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(*(
            PSABlock(self.c, attn_ratio=0.5,
                     num_heads=max(1, self.c // 64)) for _ in range(n)))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


class DFL(nn.Module):
    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(
            c1, dtype=torch.float).view(1, c1, 1, 1)
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
                         ).view(b, 4, a)


class Detect(nn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        self.nc = nc
        self.reg_max = 16
        self.strides = [8, 16, 32]
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * self.reg_max, 1)) for x in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, self.nc, 1)) for x in ch)
        self.dfl = DFL(self.reg_max)

    def forward(self, feats):
        shapes = [f.shape for f in feats]
        outs = [torch.cat((self.cv2[i](f), self.cv3[i](f)), 1)
                for i, f in enumerate(feats)]
        # inference decode (Detect._inference): anchors at cell centers
        anchors, strides = [], []
        for (b, _, h, w), s in zip(shapes, self.strides):
            yy, xx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                    torch.arange(w, dtype=torch.float32),
                                    indexing="ij")
            anchors.append(torch.stack([xx.reshape(-1) + 0.5,
                                        yy.reshape(-1) + 0.5], 0))
            strides.append(torch.full((1, h * w), float(s)))
        anc = torch.cat(anchors, 1)                   # (2, A)
        strd = torch.cat(strides, 1)                  # (1, A)
        x = torch.cat([o.view(o.shape[0], o.shape[1], -1) for o in outs], 2)
        box, cls = x.split((4 * self.reg_max, self.nc), 1)
        dist = self.dfl(box)                          # (B, 4, A) l,t,r,b
        x1y1 = anc.unsqueeze(0) - dist[:, 0:2]
        x2y2 = anc.unsqueeze(0) + dist[:, 2:4]
        cxy = (x1y1 + x2y2) / 2 * strd.unsqueeze(0)
        wh = (x2y2 - x1y1) * strd.unsqueeze(0)
        return torch.cat((cxy, wh, cls.sigmoid()), 1)  # (B, 4+nc, A)


SCALES = {"n": (0.50, 0.25, 1024), "s": (0.50, 0.50, 1024),
          "m": (0.50, 1.00, 512)}


class YOLO11Torch(nn.Module):
    """Full YOLO11 with Ultralytics layer indexing (model.0 .. model.23)."""

    def __init__(self, nc=1, scale="n"):
        super().__init__()
        depth, width, max_ch = SCALES[scale]

        def ch(c):
            return int(math.ceil(min(c, max_ch) * width / 8) * 8)

        def d(n):
            return max(1, round(n * depth))

        c3k = scale in ("m", "l", "x")
        m = [None] * 24
        m[0] = Conv(3, ch(64), 3, 2)
        m[1] = Conv(ch(64), ch(128), 3, 2)
        m[2] = C3k2(ch(128), ch(256), d(2), c3k, 0.25)
        m[3] = Conv(ch(256), ch(256), 3, 2)
        m[4] = C3k2(ch(256), ch(512), d(2), c3k, 0.25)
        m[5] = Conv(ch(512), ch(512), 3, 2)
        m[6] = C3k2(ch(512), ch(512), d(2), True)
        m[7] = Conv(ch(512), ch(1024), 3, 2)
        m[8] = C3k2(ch(1024), ch(1024), d(2), True)
        m[9] = SPPF(ch(1024), ch(1024), 5)
        m[10] = C2PSA(ch(1024), ch(1024), d(2))
        m[11] = nn.Upsample(scale_factor=2, mode="nearest")
        m[12] = nn.Identity()   # Concat
        m[13] = C3k2(ch(1024) + ch(512), ch(512), d(2), c3k)
        m[14] = nn.Upsample(scale_factor=2, mode="nearest")
        m[15] = nn.Identity()   # Concat
        m[16] = C3k2(ch(512) + ch(512), ch(256), d(2), c3k)
        m[17] = Conv(ch(256), ch(256), 3, 2)
        m[18] = nn.Identity()   # Concat
        m[19] = C3k2(ch(256) + ch(512), ch(512), d(2), c3k)
        m[20] = Conv(ch(512), ch(512), 3, 2)
        m[21] = nn.Identity()   # Concat
        m[22] = C3k2(ch(512) + ch(1024), ch(1024), d(2), True)
        m[23] = Detect(nc, (ch(256), ch(512), ch(1024)))
        self.model = nn.ModuleList(m)

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[3](m[2](x))
        p3 = m[4](x)
        p4 = m[6](m[5](p3))
        x = m[8](m[7](p4))
        p5 = m[10](m[9](x))
        u = m[11](p5)
        h4 = m[13](torch.cat([u, p4], 1))
        u = m[14](h4)
        h3 = m[16](torch.cat([u, p3], 1))
        dwn = m[17](h3)
        h4b = m[19](torch.cat([dwn, h4], 1))
        dwn = m[20](h4b)
        h5 = m[22](torch.cat([dwn, p5], 1))
        return m[23]([h3, h4b, h5])
