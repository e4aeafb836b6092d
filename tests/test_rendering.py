import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mega_nerf_tpu.models import make_nerf, make_bg_nerf
from mega_nerf_tpu.render import RenderSettings, render_rays
from tests.test_models import tiny_hparams


@dataclasses.dataclass
class FakeConfig:
    pos_dir_dim: int = 0
    appearance_dim: int = 0


@dataclasses.dataclass
class FakeBundle:
    """Analytic density/color field exposing the ModelBundle surface."""

    rgb_fn: object
    sigma_fn: object
    config: FakeConfig = dataclasses.field(default_factory=FakeConfig)
    is_mega: bool = False
    xyz_real: bool = False
    cluster_dim_start: int = 0

    def apply(self, params, typ, xyz, dirs=None, image_indices=None,
              sigma_noise=None, sigma_only=False):
        sigma = self.sigma_fn(xyz)[..., None]
        if sigma_only:
            return sigma
        rgb = self.rgb_fn(xyz)
        return jnp.concatenate([rgb, sigma], axis=-1)


def _ball_bundle(color, radius=0.5, density=1e4):
    def sigma_fn(x):
        return jnp.where(jnp.linalg.norm(x[..., :3], axis=-1) < radius, density, 0.0)

    def rgb_fn(x):
        return jnp.broadcast_to(jnp.asarray(color), x.shape[:-1] + (3,))

    return FakeBundle(rgb_fn, sigma_fn)


def _const_bundle(color, density):
    return FakeBundle(
        lambda x: jnp.broadcast_to(jnp.asarray(color), x.shape[:-1] + (3,)),
        lambda x: jnp.full(x.shape[:-1], density),
    )


def _straight_rays(n, near=0.5, far=4.0):
    """n rays from z=2 along -z toward the origin."""
    o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    nearf = jnp.full((n, 1), near)
    farf = jnp.full((n, 1), far)
    return jnp.concatenate([o, d, nearf, farf], axis=-1)


def test_fg_only_opaque_ball_color_and_depth():
    fg = _ball_bundle([0.8, 0.2, 0.4])
    settings = RenderSettings(coarse_samples=64, fine_samples=64,
                              get_depth=True, get_depth_variance=True)
    rays = _straight_rays(4)
    results, present = render_rays(fg, None, None, None, rays, None, settings)
    np.testing.assert_allclose(
        np.asarray(results["rgb_fine"]),
        np.broadcast_to([0.8, 0.2, 0.4], (4, 3)),
        atol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(results["depth_fine"]), 1.5, atol=0.05)
    assert not bool(present)
    assert (np.asarray(results["depth_variance_fine"]) < 0.05).all()


def test_fg_miss_gives_black():
    fg = _ball_bundle([1.0, 1.0, 1.0])
    settings = RenderSettings(coarse_samples=32, fine_samples=32)
    o = jnp.array([[0.0, 5.0, 2.0]])  # offset: misses the ball
    d = jnp.array([[0.0, 0.0, -1.0]])
    rays = jnp.concatenate([o, d, jnp.array([[0.5]]), jnp.array([[4.0]])], -1)
    results, _ = render_rays(fg, None, None, None, rays, None, settings)
    np.testing.assert_allclose(np.asarray(results["rgb_fine"]), 0.0, atol=1e-4)


def test_transparent_fg_composites_bg_color():
    fg = _const_bundle([1.0, 0.0, 0.0], 0.0)  # fully transparent
    bg = _const_bundle([0.2, 0.4, 0.6], 1e4)  # opaque background
    settings = RenderSettings(coarse_samples=32, fine_samples=32,
                              get_bg_fg_rgb=True)
    rays = _straight_rays(3, far=100.0)
    results, present = render_rays(
        fg, bg, None, None, rays, None, settings,
        sphere_center=jnp.zeros(3), sphere_radius=jnp.ones(3) * 3.0,
    )
    assert bool(present)
    np.testing.assert_allclose(
        np.asarray(results["rgb_fine"]),
        np.broadcast_to([0.2, 0.4, 0.6], (3, 3)),
        atol=2e-3,
    )
    np.testing.assert_allclose(np.asarray(results["fg_rgb_fine"]), 0.0, atol=1e-3)


def test_opaque_fg_blocks_bg():
    fg = _ball_bundle([0.9, 0.9, 0.1])
    bg = _const_bundle([0.0, 0.0, 1.0], 1e4)
    settings = RenderSettings(coarse_samples=64, fine_samples=64)
    rays = _straight_rays(2, far=100.0)
    results, _ = render_rays(
        fg, bg, None, None, rays, None, settings,
        sphere_center=jnp.zeros(3), sphere_radius=jnp.ones(3) * 3.0,
    )
    np.testing.assert_allclose(
        np.asarray(results["rgb_fine"]),
        np.broadcast_to([0.9, 0.9, 0.1], (2, 3)),
        atol=2e-3,
    )


def test_ray_inside_sphere_no_bg_contribution():
    # far < ellipsoid exit -> has_bg False -> bg masked out even though it
    # would be opaque blue.
    fg = _const_bundle([1.0, 0.0, 0.0], 0.0)
    bg = _const_bundle([0.0, 0.0, 1.0], 1e4)
    settings = RenderSettings(coarse_samples=32, fine_samples=32)
    rays = _straight_rays(2, far=0.9)  # stays inside r=3 sphere
    results, present = render_rays(
        fg, bg, None, None, rays, None, settings,
        sphere_center=jnp.zeros(3), sphere_radius=jnp.ones(3) * 3.0,
    )
    assert not bool(present)
    np.testing.assert_allclose(np.asarray(results["rgb_fine"]), 0.0, atol=1e-3)


def test_cascade_emits_coarse_and_fine():
    fg = _ball_bundle([0.5, 0.5, 0.5])
    settings = RenderSettings(coarse_samples=32, fine_samples=32, use_cascade=True)
    rays = _straight_rays(2)
    results, _ = render_rays(fg, None, None, None, rays, None, settings)
    assert "rgb_coarse" in results and "rgb_fine" in results
    np.testing.assert_allclose(
        np.asarray(results["rgb_coarse"]), np.asarray(results["rgb_fine"]), atol=5e-3
    )


def test_coarse_only_mode():
    fg = _ball_bundle([0.3, 0.3, 0.3])
    settings = RenderSettings(coarse_samples=64, fine_samples=0, get_depth=True)
    rays = _straight_rays(2)
    results, _ = render_rays(fg, None, None, None, rays, None, settings)
    assert "rgb_coarse" in results and "rgb_fine" not in results
    np.testing.assert_allclose(np.asarray(results["rgb_coarse"]), 0.3, atol=1e-2)


def test_real_nerf_render_jit_and_grad():
    hp = tiny_hparams(appearance_dim=4)
    fg = make_nerf(hp, appearance_count=3)
    bg = make_bg_nerf(hp, appearance_count=3)
    fg_params = fg.init(jax.random.key(0))
    bg_params = bg.init(jax.random.key(1))
    settings = RenderSettings(coarse_samples=16, fine_samples=16)
    rays = _straight_rays(8, far=100.0)
    idx = jnp.zeros(8, jnp.int32)
    target = jnp.full((8, 3), 0.5)

    def loss_fn(fp, bp, key):
        results, present = render_rays(
            fg, bg, fp, bp, rays, idx, settings,
            sphere_center=jnp.zeros(3), sphere_radius=jnp.ones(3) * 3.0,
            train=True, key=key,
        )
        return jnp.mean((results["rgb_fine"] - target) ** 2), present

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True))
    (loss, present), grads = grad_fn(fg_params, bg_params, jax.random.key(2))
    assert np.isfinite(float(loss))
    assert bool(present)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # Both models must receive nonzero gradient somewhere.
    fg_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads[0]))
    bg_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads[1]))
    assert fg_norm > 0 and bg_norm > 0


def test_train_grouped_cdf_bit_identical():
    """`train_grouped_cdf=True` routes the train fine sampler through the
    two-level grouped bracketing (op-level bit-equality is pinned in
    test_ops_sampling); this pins the RenderSettings plumbing: same key ->
    bit-identical render. coarse_samples=96 puts the cdf above the 64-entry
    grouped-path threshold so the flag actually changes the lowering."""
    hp = tiny_hparams()
    fg = make_nerf(hp, appearance_count=1)
    fg_params = fg.init(jax.random.key(0))
    rays = _straight_rays(4)
    outs = []
    for grouped in (False, True):
        settings = RenderSettings(coarse_samples=96, fine_samples=16,
                                  train_grouped_cdf=grouped)
        r, _ = render_rays(fg, None, fg_params, None, rays, None, settings,
                           train=True, key=jax.random.key(3))
        outs.append(np.asarray(r["rgb_fine"]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_train_grouped_merge_bit_identical_with_grads():
    """`train_grouped_merge=True` routes the train coarse+fine compositor
    through the grouped cross terms (op-level value+gradient equality is
    pinned in test_ops_compositing); this pins the RenderSettings plumbing:
    same key -> bit-identical loss AND gradients through the full train
    render."""
    hp = tiny_hparams()
    fg = make_nerf(hp, appearance_count=1)
    fg_params = fg.init(jax.random.key(0))
    rays = _straight_rays(4)
    target = jnp.full((4, 3), 0.5)
    outs = []
    for grouped in (False, True):
        settings = RenderSettings(coarse_samples=16, fine_samples=16,
                                  train_grouped_merge=grouped)

        def loss_fn(fp):
            r, _ = render_rays(fg, None, fp, None, rays, None, settings,
                               train=True, key=jax.random.key(3))
            return jnp.mean((r["rgb_fine"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(fg_params)
        outs.append((float(loss), jax.tree.leaves(grads)))
    assert outs[0][0] == outs[1][0]
    for g0, g1 in zip(outs[0][1], outs[1][1]):
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-6, atol=1e-7)


def test_ref_bg_sampling_flag(monkeypatch):
    """`--ref_bg_sampling` reproduces the reference's bg fine-sampling
    quirk (`/root/reference/mega_nerf/rendering.py:213-216` vs `271-273`):
    descending-order coarse weights paired with ascending bins. Pinned by
    spying on the CDF builder: in ref mode the bg weights reaching
    sample_pdf are exactly the reverse of the default mode's, while the
    fg weights are untouched."""
    from mega_nerf_tpu.render import rendering as R

    hp = tiny_hparams()
    fg = make_nerf(hp, appearance_count=1)
    bg = make_bg_nerf(hp, appearance_count=1)
    fg_params = fg.init(jax.random.key(0))
    bg_params = bg.init(jax.random.key(1))
    rays = _straight_rays(4, far=100.0)

    real_sample_pdf = R.sample_pdf
    captured = {}

    def run(ref_mode):
        calls = []

        def spy(bins, weights, *a, **kw):
            calls.append(np.asarray(weights))
            return real_sample_pdf(bins, weights, *a, **kw)

        monkeypatch.setattr(R, "sample_pdf", spy)
        settings = RenderSettings(coarse_samples=16, fine_samples=16,
                                  ref_bg_sampling=ref_mode)
        r, _ = render_rays(
            fg, bg, fg_params, bg_params, rays, None, settings,
            sphere_center=jnp.zeros(3), sphere_radius=jnp.ones(3) * 3.0,
        )
        assert len(calls) == 2  # bg pass first, then fg
        captured[ref_mode] = calls
        return np.asarray(r["rgb_fine"])

    rgb_default = run(False)
    rgb_ref = run(True)
    bg_default, fg_default = captured[False]
    bg_ref, fg_ref = captured[True]
    # ref mode feeds the CDF the reversed (descending-order) bg weights...
    np.testing.assert_array_equal(bg_ref, bg_default[:, ::-1])
    # ...and leaves the fg sampling untouched.
    np.testing.assert_array_equal(fg_ref, fg_default)
    # The modes really sample differently wherever bg weights are asymmetric.
    asym = np.abs(bg_default - bg_default[:, ::-1]).max() > 1e-9
    if asym:
        assert not np.array_equal(rgb_default, rgb_ref)


def test_eval_deterministic_train_stochastic():
    hp = tiny_hparams()
    fg = make_nerf(hp, appearance_count=1)
    fg_params = fg.init(jax.random.key(0))
    settings = RenderSettings(coarse_samples=8, fine_samples=8)
    rays = _straight_rays(4)
    r1, _ = render_rays(fg, None, fg_params, None, rays, None, settings)
    r2, _ = render_rays(fg, None, fg_params, None, rays, None, settings)
    np.testing.assert_array_equal(np.asarray(r1["rgb_fine"]), np.asarray(r2["rgb_fine"]))
    r3, _ = render_rays(fg, None, fg_params, None, rays, None, settings,
                        train=True, key=jax.random.key(1))
    r4, _ = render_rays(fg, None, fg_params, None, rays, None, settings,
                        train=True, key=jax.random.key(2))
    assert not np.array_equal(np.asarray(r3["rgb_fine"]), np.asarray(r4["rgb_fine"]))


def _merge_spy(monkeypatch):
    from mega_nerf_tpu.render import rendering as R

    calls = []
    real_merge = R.composite_weights_merge

    def spy(*args, **kwargs):
        calls.append("merge")
        return real_merge(*args, **kwargs)

    monkeypatch.setattr(R, "composite_weights_merge", spy)
    return calls


def test_eval_compositor_gated_by_probe(monkeypatch):
    """The eval compositor choice is probe/version-gated per compiler build.

    One deployed libtpu crashes lowering the merge's (N, Sa, Sb) masked
    reduces composed with the Pallas eval kernels at image-chunk batches
    (bisected on hardware — see _inference). Policy: "auto" asks
    `compositor_probe.merge_eval_ok` (True here: CPU backends always lower
    it cleanly); "union"/"merge" force; train always keeps the merge.
    """
    calls = _merge_spy(monkeypatch)
    hp = tiny_hparams()
    fg = make_nerf(hp, appearance_count=1)
    fg_params = fg.init(jax.random.key(0))
    rays = _straight_rays(4)

    def render(settings, **kw):
        calls.clear()
        r, _ = render_rays(fg, None, fg_params, None, rays, None, settings, **kw)
        return np.asarray(r["rgb_fine"]), list(calls)

    auto = RenderSettings(coarse_samples=8, fine_samples=8)
    merge = dataclasses.replace(auto, eval_compositor="merge")
    union = dataclasses.replace(auto, eval_compositor="union")

    img_auto, c_auto = render(auto)
    assert c_auto == ["merge"], "auto on CPU must pick the cheap merge"
    img_merge, c_merge = render(merge)
    assert c_merge == ["merge"]
    img_union, c_union = render(union)
    assert c_union == [], "forced union must not compile the merge"
    grouped = dataclasses.replace(auto, eval_compositor="merge_grouped")
    img_grouped, c_grouped = render(grouped)
    assert c_grouped == [], "forced grouped must not compile the pairwise merge"
    # All compositors produce the same picture (perturb=0 eval lists are
    # sorted, the merge applies exactly).
    np.testing.assert_allclose(img_union, img_merge, atol=1e-6)
    np.testing.assert_allclose(img_grouped, img_merge, atol=1e-5)
    np.testing.assert_array_equal(img_auto, img_merge)

    _, c_train = render(union, train=True, key=jax.random.key(1))
    assert c_train == ["merge"], "train path always uses the merge"


def test_compositor_probe_policy(tmp_path, monkeypatch):
    """eval_compositor_choice: env override > backend > per-(compositor,
    build) known-bad gate > per-candidate cached probe, in preference
    order with union as the fallback."""
    from mega_nerf_tpu.render import compositor_probe as CP

    monkeypatch.setattr(CP, "_MEMO", {})
    cache = tmp_path / "probe.json"

    # CPU backend: merge without probing (a failing probe must not run).
    def boom(_c):
        raise AssertionError("probe must not run on CPU backends")

    assert CP.eval_compositor_choice(probe=boom, cache_path=cache) == "merge"
    assert CP.merge_eval_ok(probe=boom, cache_path=cache) is True

    # Pretend we are on a TPU backend from here on.
    monkeypatch.setattr(CP, "_is_tpu_backend", lambda: True)

    # Known-bad serving compiler: the pairwise merge is never probed there,
    # but the grouped merge (different lowering) gets a real probe.
    bad_build = CP.KNOWN_BAD_BUILDS[0][1]
    bad = f"axon tpu Built on Nov 12 2025 {bad_build}"
    probed = []

    def probe_record_fail(c):
        probed.append(c)
        return False

    monkeypatch.setattr(CP, "_MEMO", {})
    assert CP.eval_compositor_choice(
        probe=probe_record_fail, cache_path=cache, version=bad) == "union"
    assert probed == ["merge_grouped"], "merge must be gated, not probed"

    # ... and when the grouped probe passes on the known-bad build, it wins.
    monkeypatch.setattr(CP, "_MEMO", {})
    cache2 = tmp_path / "probe2.json"
    assert CP.eval_compositor_choice(
        probe=lambda c: True, cache_path=cache2, version=bad
    ) == "merge_grouped"

    # Unknown compiler: candidates probed in order, verdicts cached on disk.
    probes = []

    def probe_first_fails(c):
        probes.append(c)
        return c != "merge_grouped"

    v = "axon tpu cl/999"
    monkeypatch.setattr(CP, "_MEMO", {})
    cache3 = tmp_path / "probe3.json"
    assert CP.eval_compositor_choice(
        probe=probe_first_fails, cache_path=cache3, version=v) == "merge"
    assert probes == ["merge_grouped", "merge"] and cache3.exists()
    monkeypatch.setattr(CP, "_MEMO", {})  # fresh process -> disk cache hit
    assert CP.eval_compositor_choice(
        probe=boom, cache_path=cache3, version=v) == "merge"
    assert CP.merge_eval_ok(probe=boom, cache_path=cache3, version=v) is True

    # All candidates failing pins union for that build.
    monkeypatch.setattr(CP, "_MEMO", {})
    v2 = "axon tpu cl/1000"
    assert CP.eval_compositor_choice(
        probe=lambda c: False, cache_path=cache3, version=v2) == "union"
    assert CP.eval_compositor_choice(
        probe=boom, cache_path=cache3, version=v2) == "union"
    assert CP.merge_eval_ok(probe=boom, cache_path=cache3, version=v2) is False

    # A round-2 cache (bare merge bool) is upgraded, not crashed on.
    import json
    cache4 = tmp_path / "probe4.json"
    cache4.write_text(json.dumps({v: True}))
    monkeypatch.setattr(CP, "_MEMO", {})
    assert CP.eval_compositor_choice(
        probe=lambda c: c == "merge_grouped", cache_path=cache4, version=v
    ) == "merge_grouped"

    # Env override beats everything, all three values.
    monkeypatch.setattr(CP, "_MEMO", {})
    monkeypatch.setenv(CP.ENV_OVERRIDE, "merge")
    assert CP.eval_compositor_choice(
        probe=boom, cache_path=cache, version=bad) == "merge"
    monkeypatch.setenv(CP.ENV_OVERRIDE, "merge_grouped")
    assert CP.eval_compositor_choice(
        probe=boom, cache_path=cache, version=v) == "merge_grouped"
    monkeypatch.setenv(CP.ENV_OVERRIDE, "union")
    assert CP.merge_eval_ok(probe=boom, cache_path=cache, version=v) is False



def test_distortion_loss_term():
    """--distortion_loss_weight > 0 emits a per-ray coarse-pass distortion
    (Mip-NeRF 360 form): concentrated density scores lower than spread-out
    density of equal total opacity, the term is differentiable, and the
    default-off setting leaves the results dict unchanged."""
    rays = _straight_rays(4)

    def render_with(bundle, weight):
        st = RenderSettings(coarse_samples=32, fine_samples=8,
                            distortion_loss_weight=weight)
        r, _ = render_rays(bundle, None, {}, None, rays, None, st,
                           train=True, key=jax.random.key(0))
        return r

    # default off: no key
    assert "distortion_coarse" not in render_with(_ball_bundle([1, 0, 0]), 0.0)

    concentrated = _ball_bundle([1.0, 0.0, 0.0], radius=0.2, density=1e4)
    # haze: low uniform density everywhere -> weights spread along the ray
    hazy = _const_bundle([1.0, 0.0, 0.0], density=1.0)
    d_conc = np.asarray(
        render_with(concentrated, 1.0)["distortion_coarse"]
    )
    d_hazy = np.asarray(render_with(hazy, 1.0)["distortion_coarse"])
    assert d_conc.shape == (4,)
    assert (d_conc >= -1e-6).all() and (d_hazy >= -1e-6).all()
    assert d_hazy.mean() > 5 * max(d_conc.mean(), 1e-6), (
        d_hazy.mean(), d_conc.mean())

    # differentiable: gradient of the mean term w.r.t. a density scale
    import dataclasses as _dc

    def loss(scale):
        bundle = FakeBundle(
            lambda x: jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                                       x.shape[:-1] + (3,)),
            lambda x: jnp.full(x.shape[:-1], 1.0) * scale,
        )
        st = RenderSettings(coarse_samples=16, fine_samples=0,
                            distortion_loss_weight=1.0)
        r, _ = render_rays(bundle, None, {}, None, rays, None, st,
                           train=True, key=jax.random.key(1))
        return jnp.mean(r["distortion_coarse"])

    g = float(np.asarray(jax.grad(loss)(jnp.asarray(2.0))))
    assert np.isfinite(g) and g != 0.0


def test_train_dir_pack_probe_policy(tmp_path, monkeypatch):
    """train_dir_pack_choice: env override > non-TPU off > known-bad build
    never probed > cached per-build probe verdict. The packed-dir TRAIN
    layout hangs one deployed libtpu's Mosaic compile (PERF.md round 2);
    this gate auto-enables it the moment the serving compiler upgrades."""
    from mega_nerf_tpu.render import compositor_probe as CP

    monkeypatch.setattr(CP, "_TRAIN_DIR_PACK_MEMO", {})
    cache = tmp_path / "probe.json"

    def boom():
        raise AssertionError("probe must not run here")

    # Non-TPU backends: off, never probed.
    assert CP.train_dir_pack_choice(probe=boom, cache_path=cache) is False

    monkeypatch.setattr(CP, "_is_tpu_backend", lambda: True)

    # Env override wins outright.
    monkeypatch.setenv(CP.TRAIN_DIR_PACK_ENV, "1")
    assert CP.train_dir_pack_choice(probe=boom, cache_path=cache) is True
    monkeypatch.setenv(CP.TRAIN_DIR_PACK_ENV, "0")
    assert CP.train_dir_pack_choice(probe=boom, cache_path=cache) is False
    monkeypatch.delenv(CP.TRAIN_DIR_PACK_ENV)

    # The known-hanging build is gated without probing (a timed-out remote
    # compile can wedge the relay's compile service for hours).
    bad = f"axon tpu Built on Nov 12 2025 {CP.TRAIN_DIR_PACK_BAD_BUILDS[0]}"
    assert CP.train_dir_pack_choice(
        probe=boom, cache_path=cache, version=bad) is False

    # Unknown build: probed once, verdict cached on disk.
    calls = []

    def probe_ok():
        calls.append(1)
        return True

    v = "axon tpu cl/999999"
    assert CP.train_dir_pack_choice(
        probe=probe_ok, cache_path=cache, version=v) is True
    assert calls == [1] and cache.exists()
    monkeypatch.setattr(CP, "_TRAIN_DIR_PACK_MEMO", {})  # fresh process
    assert CP.train_dir_pack_choice(
        probe=boom, cache_path=cache, version=v) is True

    # Coexists with eval-compositor verdicts for the same build key.
    monkeypatch.setattr(CP, "_MEMO", {})
    assert CP.eval_compositor_choice(
        probe=lambda c: c == "merge", cache_path=cache, version=v) == "merge"
    monkeypatch.setattr(CP, "_TRAIN_DIR_PACK_MEMO", {})
    assert CP.train_dir_pack_choice(
        probe=boom, cache_path=cache, version=v) is True
