"""Weight-conversion parity: torch YOLO11 -> converter -> flax forward.

The reference proves its engine path with detection_test.cpp (real engine on
real images); without network access to Ultralytics checkpoints, the
equivalent guarantee here is structural: a state_dict from a faithful torch
YOLO11 implementation (tests/torch_yolo_ref.py, Ultralytics module layout
and key names) must convert into the flax model and produce the SAME
outputs. This fails if the converter's name mapping, the BN-statistics
transfer, the head biases, or the flax architecture drift from Ultralytics.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.torch_yolo_ref import YOLO11Torch  # noqa: E402


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from scripts.convert_yolo_weights import convert
    tmp = tmp_path_factory.mktemp("yolo")
    torch.manual_seed(0)
    model = YOLO11Torch(nc=2, scale="n").eval()
    # randomize BatchNorm affine params and running statistics: the default
    # init (gamma=1, beta=0, mean=0, var=1) would hide a converter that
    # forgets to transfer them
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.3, 0.3)
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    pt = tmp / "ref.pt"
    torch.save({"model": model}, pt)
    npz = tmp / "ref.npz"
    convert(str(pt), str(npz), num_classes=2, scale="n", img_size=160)
    return model, str(npz)


def test_converted_outputs_match_torch(converted):
    from ros_vision_tpu.models.infer import ModelInference
    model, npz = converted
    m = ModelInference(num_classes=2, scale="n", img_size=160,
                       params_path=npz, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    img = rng.random((1, 160, 160, 3), np.float32)
    with torch.no_grad():
        t_out = model(torch.from_numpy(
            img.transpose(0, 3, 1, 2))).numpy()          # (1, 4+nc, A)
    f_out = np.asarray(m.model.apply(m.variables, jnp.asarray(img)))

    assert t_out.shape == f_out.shape
    # boxes are in input pixels (<=160), scores in [0,1]
    box_err = np.abs(t_out[:, :4] - f_out[:, :4]).max()
    cls_err = np.abs(t_out[:, 4:] - f_out[:, 4:]).max()
    assert box_err < 0.05, f"box deviation {box_err}"
    assert cls_err < 1e-3, f"score deviation {cls_err}"


def test_convert_rejects_unmapped_keys(tmp_path):
    """A checkpoint with an unexpected extra tensor must be refused rather
    than silently partially converted."""
    from scripts.convert_yolo_weights import convert
    torch.manual_seed(0)
    model = YOLO11Torch(nc=2, scale="n").eval()
    sd = model.state_dict()
    sd["model.2.cv1.conv.weight"] = torch.zeros(7, 7, 3, 3)  # bad shape
    pt = tmp_path / "bad.pt"
    torch.save(sd, pt)
    with pytest.raises(SystemExit):
        convert(str(pt), str(tmp_path / "bad.npz"),
                num_classes=2, scale="n", img_size=160)
