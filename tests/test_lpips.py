"""LPIPS-alex oracle test: the pure-JAX implementation (utils/lpips.py)
vs a hand-built torch replica of lpips.LPIPS(net='alex') with random
weights (same pattern as the UNet/VAE converter oracles — torch cpu is
available, the lpips/torchvision packages are not)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from hallo_tpu.utils.lpips import (  # noqa: E402
    _CONV_INDICES, _SCALE, _SHIFT, _TAP_CHANNELS,
    convert_lpips_state_dict, load_lpips, lpips_distance, lpips_from_uint8,
)


class _TorchLPIPSAlex(torch.nn.Module):
    """Replica of lpips.LPIPS(net='alex'): torchvision AlexNet features
    (richzhang/PerceptualSimilarity pretrained_networks.py indices 0..11)
    sliced at the five ReLU taps, unit-normalize, 1x1 lin weights on the
    squared diff, spatial mean, sum."""

    def __init__(self):
        super().__init__()
        chans = (3,) + _TAP_CHANNELS
        specs = [(11, 4, 2), (5, 1, 2), (3, 1, 1), (3, 1, 1), (3, 1, 1)]
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv2d(chans[i], chans[i + 1], k, s, p)
            for i, (k, s, p) in enumerate(specs)
        )
        self.lins = torch.nn.ParameterList(
            torch.nn.Parameter(torch.rand(1, c, 1, 1)) for c in _TAP_CHANNELS
        )
        self.pool = torch.nn.MaxPool2d(3, 2)
        self.register_buffer("shift", torch.tensor(_SHIFT).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor(_SCALE).view(1, 3, 1, 1))

    def taps(self, x):
        x = (x - self.shift) / self.scale
        out = []
        for k, conv in enumerate(self.convs):
            if k in (1, 2):
                x = self.pool(x)
            x = torch.relu(conv(x))
            out.append(x)
        return out

    def forward(self, a, b):
        total = 0.0
        for ta, tb, lin in zip(self.taps(a), self.taps(b), self.lins):
            na = ta / torch.sqrt((ta * ta).sum(1, keepdim=True) + 1e-10)
            nb = tb / torch.sqrt((tb * tb).sum(1, keepdim=True) + 1e-10)
            total = total + ((na - nb) ** 2 * lin).sum(1).mean((1, 2))
        return total

    def lpips_state_dict(self):
        sd = {}
        for k, idx in enumerate(_CONV_INDICES):
            sd[f"net.slice{k + 1}.{idx}.weight"] = self.convs[k].weight
            sd[f"net.slice{k + 1}.{idx}.bias"] = self.convs[k].bias
        for k, lin in enumerate(self.lins):
            sd[f"lin{k}.model.1.weight"] = lin
        return sd


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    with torch.no_grad():
        net = _TorchLPIPSAlex().eval()
    return net


def test_lpips_matches_torch_oracle(oracle):
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(a).permute(0, 3, 1, 2),
            torch.from_numpy(b).permute(0, 3, 1, 2),
        ).numpy()
    params = convert_lpips_state_dict(oracle.lpips_state_dict())
    got = np.asarray(lpips_distance(params, a, b))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_lpips_identity_is_zero(oracle):
    params = convert_lpips_state_dict(oracle.lpips_state_dict())
    a = np.random.default_rng(1).uniform(0, 255, (1, 3, 96, 96, 3))
    a = a.astype(np.uint8)
    assert lpips_from_uint8(params, a, a) == pytest.approx(0.0, abs=1e-6)
    assert lpips_from_uint8(params, a, 255 - a) > 1e-3


def test_lpips_converter_rejects_wrong_file(oracle):
    sd = oracle.lpips_state_dict()
    sd.pop("lin3.model.1.weight")
    with pytest.raises(KeyError, match="lin3"):
        convert_lpips_state_dict(sd)


def test_load_lpips_skips_with_reason(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no pretrained_models/ here
    monkeypatch.delenv("HALLO_LPIPS_WEIGHTS", raising=False)
    params, reason = load_lpips()
    assert params is None and "skipped" in reason


def test_load_lpips_roundtrip_via_pth(tmp_path, oracle):
    path = tmp_path / "lpips_alex.pth"
    torch.save({k: v.detach() for k, v in oracle.lpips_state_dict().items()},
               str(path))
    params, reason = load_lpips(str(path))
    assert params is not None, reason
    assert len(params["convs"]) == 5 and len(params["lins"]) == 5
