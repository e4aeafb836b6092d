"""LPIPS architecture parity: the pure-JAX implementation must match a torch
replica of the LPIPS computation bit-for-float on the SAME weights.

No pretrained weights exist in this image (zero egress), so we validate the
math structurally: random weights with the exact torchvision/lpips key+shape
contract drive both our jnp implementation and an independent torch.nn.
functional replica; outputs must agree to float32 conv tolerance. With that,
the published weights (converted by scripts/convert_lpips_weights.py) slot
in without any code change and reproduce the reference metric
(`/root/reference/mega_nerf/metrics.py:13-26`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch.nn.functional as F  # noqa: E402

from mega_nerf_tpu.ops.lpips import (  # noqa: E402
    _SCALE,
    _SHIFT,
    LPIPS,
    PROGRAMS,
    TAP_CHANNELS,
    expected_keys,
    validate_weights,
)


def random_weights(net: str, seed: int = 0):
    rng = np.random.default_rng(seed)
    out = {}
    for k, shape in expected_keys(net).items():
        w = rng.normal(0, 0.2, size=shape).astype(np.float32)
        if k.startswith("lin."):
            w = np.abs(w)  # LPIPS lins are non-negative
        out[k] = w
    return out


def torch_lpips_replica(net: str, weights, img0: np.ndarray, img1: np.ndarray):
    """Independent re-implementation in torch following the same program."""

    def conv(x, key, stride=1, pad=0):
        return F.conv2d(
            x, torch.from_numpy(np.asarray(weights[f"{key}.weight"])),
            torch.from_numpy(np.asarray(weights[f"{key}.bias"])),
            stride=stride, padding=pad,
        )

    def fire(x, prefix):
        s = F.relu(conv(x, f"{prefix}.squeeze"))
        e1 = F.relu(conv(s, f"{prefix}.expand1x1"))
        e3 = F.relu(conv(s, f"{prefix}.expand3x3", pad=1))
        return torch.cat([e1, e3], dim=1)

    def features(x):
        taps = []
        for op in PROGRAMS[net]:
            if op[0] == "conv":
                x = conv(x, op[1], op[2], op[3])
            elif op[0] == "relu":
                x = F.relu(x)
            elif op[0] == "pool":
                x = F.max_pool2d(x, op[1], op[2], ceil_mode=op[3])
            elif op[0] == "fire":
                x = fire(x, op[1])
            else:
                taps.append(x)
        return taps

    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def prep(img):
        t = torch.from_numpy(img).permute(0, 3, 1, 2).contiguous()
        return (2.0 * t - 1.0 - shift) / scale

    def unit(x):
        return x / (torch.sqrt((x * x).sum(dim=1, keepdim=True)) + 1e-10)

    with torch.no_grad():
        taps0, taps1 = features(prep(img0)), features(prep(img1))
        total = torch.zeros(img0.shape[0])
        for i, (t0, t1) in enumerate(zip(taps0, taps1)):
            diff = (unit(t0) - unit(t1)) ** 2
            lin = torch.from_numpy(np.asarray(weights[f"lin.{i}.weight"]))
            total = total + (diff * lin.view(1, -1, 1, 1)).sum(1).mean((1, 2))
    return total.numpy()


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_jax_matches_torch_replica(net):
    rng = np.random.default_rng(7)
    # 64x64: big enough to survive alexnet's stride-4 + three pools.
    img0 = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(np.float32)

    weights = random_weights(net)
    validate_weights(net, {k: np.asarray(v) for k, v in weights.items()})

    ours = np.asarray(LPIPS(net, weights)(img0, img1))
    ref = torch_lpips_replica(net, weights, img0, img1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)

    # Identical images -> exactly zero; distance grows with perturbation.
    zero = np.asarray(LPIPS(net, weights)(img0, img0))
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_tap_channels_match_lpips_heads(net):
    """The backbone programs produce taps with exactly the channel widths the
    published LPIPS linear heads expect — the key compatibility contract."""
    import jax.numpy as jnp

    from mega_nerf_tpu.ops.lpips import _features

    weights = {
        k: jnp.asarray(v) for k, v in random_weights(net).items()
    }
    x = jnp.zeros((1, 3, 64, 64), jnp.float32)
    taps = _features(net, weights, x)
    assert [t.shape[1] for t in taps] == TAP_CHANNELS[net]


def test_metrics_lpips_uses_npz_weights(tmp_path, monkeypatch):
    """ops.metrics.lpips picks up {net}.npz files from the weights dir."""
    np.savez(tmp_path / "alex.npz", **random_weights("alex"))
    monkeypatch.setenv("MEGA_NERF_TPU_LPIPS_WEIGHTS", str(tmp_path))

    import mega_nerf_tpu.ops.metrics as metrics

    metrics._LPIPS_CACHE.clear()
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    out = metrics.lpips(a, b)
    assert "alex" in out and out["alex"] > 0
    assert metrics.lpips(a, a)["alex"] == pytest.approx(0.0, abs=1e-6)
    metrics._LPIPS_CACHE.clear()
