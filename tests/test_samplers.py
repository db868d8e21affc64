"""Golden-parity tests for the resamplers and the depth-distribution loss.

Deterministic paths (det=True) are compared bit-for-bit-ish against the torch
reference; stochastic paths are checked for structural invariants (sorted,
in-range, endpoints pinned).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.core import dd, sampling
from ddnerf_tpu.core import math as mmath

from conftest import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)


class _RefCfg:
    """Duck-typed cfg for the reference samplers/dd_utils."""

    def __init__(self, pdf_padding=True, ds_type="blender", near=2.0, far=6.0):
        class TP:
            pass

        class DS:
            pass

        self.train_params = TP()
        self.train_params.pdf_padding = pdf_padding
        self.dataset = DS()
        self.dataset.type = ds_type
        self.dataset.near = near
        self.dataset.far = far


@pytest.fixture(scope="module")
def ref():
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import models.samplers as ref_samplers
    import models.dd_utils as ref_dd

    return ref_samplers, ref_dd


def _histogram(rng, n, s, near=2.0, far=6.0):
    interior = rng.uniform(near, far, (n, s - 1)).astype(np.float32)
    bins = np.concatenate(
        [np.full((n, 1), near, np.float32), np.sort(interior, -1),
         np.full((n, 1), far, np.float32)], axis=-1,
    )
    weights = (rng.uniform(0, 1, (n, s)) ** 2).astype(np.float32)
    return bins, weights


# ------------------------------------------------------------- sample_pdf


@requires_reference
@pytest.mark.parametrize("pdf_padding", [True, False])
def test_sample_pdf_det_parity(ref, pdf_padding):
    import torch

    ref_samplers, _ = ref
    rng = np.random.default_rng(0)
    bins, weights = _histogram(rng, 7, 16)
    m = 33

    out_ref = ref_samplers.sample_pdf(
        torch.tensor(bins), torch.tensor(weights), m,
        _RefCfg(pdf_padding=pdf_padding), det=True,
    ).detach().numpy()
    out_jax = sampling.sample_pdf(
        jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights), m,
        pdf_padding=jnp.asarray(pdf_padding), det=True,
    )
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-4, atol=1e-5)


def test_sample_pdf_stochastic_invariants():
    rng = np.random.default_rng(1)
    bins, weights = _histogram(rng, 5, 8)
    out = sampling.sample_pdf(
        jax.random.PRNGKey(3), jnp.asarray(bins), jnp.asarray(weights), 17,
        pdf_padding=jnp.asarray(True), det=False,
    )
    out = np.asarray(out)
    assert (out >= bins[:, :1] - 1e-5).all() and (out <= bins[:, -1:] + 1e-5).all()


def test_sample_pdf_concentrates_mass():
    # All the weight in one section -> most samples land inside it.  With the
    # 0.8/0.1/0.1 neighbor mix (pdf_padding=False) ~80% of mass stays put.
    bins = jnp.asarray([[2.0, 3.0, 4.0, 5.0, 6.0]])
    weights = jnp.asarray([[0.0, 100.0, 0.0, 0.0]])
    out = sampling.sample_pdf(
        jax.random.PRNGKey(0), bins, weights, 64,
        pdf_padding=jnp.asarray(False), det=True,
    )
    frac_inside = np.mean((np.asarray(out) >= 3.0) & (np.asarray(out) <= 4.0))
    assert frac_inside > 0.7


# ------------------------------------------- sample_pdf_with_mu_sigma


def _dd_inputs(rng, n, s):
    bins, weights = _histogram(rng, n, s)
    mus = rng.uniform(0.2, 0.8, (n, s)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.5, (n, s)).astype(np.float32)
    lt, pib = mmath.truncated_gaussian_tails(jnp.asarray(mus), jnp.asarray(sigmas))
    return bins, weights, mus, sigmas, np.asarray(lt), np.asarray(pib)


@requires_reference
@pytest.mark.parametrize("pdf_padding", [True, False])
def test_sample_pdf_mu_sigma_det_parity(ref, pdf_padding):
    import torch

    ref_samplers, _ = ref
    rng = np.random.default_rng(2)
    bins, weights, mus, sigmas, lt, pib = _dd_inputs(rng, 6, 12)
    m = 25

    out_ref = ref_samplers.sample_pdf_with_mu_sigma(
        torch.tensor(bins), torch.tensor(weights), torch.tensor(mus),
        torch.tensor(sigmas), torch.tensor(pib), torch.tensor(lt), m,
        _RefCfg(pdf_padding=pdf_padding), det=True,
    ).detach().numpy()
    out_jax = sampling.sample_pdf_with_mu_sigma(
        jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights),
        jnp.asarray(mus), jnp.asarray(sigmas), jnp.asarray(pib), jnp.asarray(lt),
        m, near=2.0, far=6.0, pdf_padding=jnp.asarray(pdf_padding), det=True,
    )
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-4, atol=1e-4)


def test_sample_pdf_mu_sigma_endpoints_and_sorted():
    rng = np.random.default_rng(3)
    bins, weights, mus, sigmas, lt, pib = _dd_inputs(rng, 4, 9)
    out = sampling.sample_pdf_with_mu_sigma(
        jax.random.PRNGKey(7), jnp.asarray(bins), jnp.asarray(weights),
        jnp.asarray(mus), jnp.asarray(sigmas), jnp.asarray(pib), jnp.asarray(lt),
        13, near=2.0, far=6.0, pdf_padding=jnp.asarray(True), det=False,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, 0], 2.0)
    np.testing.assert_allclose(out[:, -1], 6.0)
    assert (np.diff(out, axis=-1) >= 0).all()


# ------------------------------------------------------------ dp loss


@requires_reference
@pytest.mark.parametrize("ds_type", ["blender", "llff"])
def test_estimate_dp_loss_parity(ref, ds_type):
    import torch

    _, ref_dd = ref
    rng = np.random.default_rng(4)
    n, s, m = 8, 10, 14
    t0, w0 = _histogram(rng, n, s)
    t1, w1 = _histogram(rng, n, m)
    mus = rng.uniform(0.2, 0.8, (n, s)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.5, (n, s)).astype(np.float32)
    lt, pib = mmath.truncated_gaussian_tails(jnp.asarray(mus), jnp.asarray(sigmas))
    lt, pib = np.asarray(lt), np.asarray(pib)
    # NOTE: no empty rays here on purpose — the reference's blender filter
    # forgets to filter left_tails_0 (dd_utils.py:22-28), misaligning rows
    # whenever a ray is dropped; we fix that, so exact parity only holds for
    # the no-empty-ray case (see dd.estimate_dp_loss docstring).

    out_ref = ref_dd.estimate_dp_loss(
        torch.tensor(t1), torch.tensor(t0), torch.tensor(w1), torch.tensor(w0),
        torch.tensor(mus), torch.tensor(sigmas), torch.tensor(lt),
        torch.tensor(pib), _RefCfg(ds_type=ds_type),
    ).item() * (m + 1 - 1)

    out_jax = dd.estimate_dp_loss(
        jnp.asarray(t1), jnp.asarray(t0), jnp.asarray(w1), jnp.asarray(w0),
        jnp.asarray(mus), jnp.asarray(sigmas), jnp.asarray(lt), jnp.asarray(pib),
        filter_empty_rays=(ds_type == "blender"),
    ) * (m + 1 - 1)

    np.testing.assert_allclose(float(out_jax), out_ref, rtol=2e-3, atol=1e-5)


def test_dp_loss_zero_when_matched():
    # When the fine histogram is resampled exactly from the coarse
    # distribution, KL should be small; against a mismatched one, larger.
    rng = np.random.default_rng(5)
    n, s = 16, 8
    t0, w0 = _histogram(rng, n, s)
    mus = np.full((n, s), 0.5, np.float32)
    sigmas = np.full((n, s), 10.0, np.float32)  # ~uniform in cell
    lt, pib = mmath.truncated_gaussian_tails(jnp.asarray(mus), jnp.asarray(sigmas))

    kl_self = dd.estimate_dp_loss(
        jnp.asarray(t0), jnp.asarray(t0), jnp.asarray(w0), jnp.asarray(w0),
        jnp.asarray(mus), jnp.asarray(sigmas), lt, pib, filter_empty_rays=False,
    )
    w_wrong = np.roll(w0, 3, axis=-1)
    kl_wrong = dd.estimate_dp_loss(
        jnp.asarray(t0), jnp.asarray(t0), jnp.asarray(w_wrong), jnp.asarray(w0),
        jnp.asarray(mus), jnp.asarray(sigmas), lt, pib, filter_empty_rays=False,
    )
    assert float(kl_self) < float(kl_wrong)


def test_dp_loss_all_empty_rays_is_zero():
    rng = np.random.default_rng(6)
    n, s, m = 4, 6, 9
    t0, w0 = _histogram(rng, n, s)
    t1, _ = _histogram(rng, n, m)
    w1 = np.zeros((n, m), np.float32)
    mus = np.full((n, s), 0.5, np.float32)
    sigmas = np.full((n, s), 0.3, np.float32)
    lt, pib = mmath.truncated_gaussian_tails(jnp.asarray(mus), jnp.asarray(sigmas))
    out = dd.estimate_dp_loss(
        jnp.asarray(t1), jnp.asarray(t0), jnp.asarray(w1), jnp.asarray(w0),
        jnp.asarray(mus), jnp.asarray(sigmas), lt, pib, filter_empty_rays=True,
    )
    assert np.isfinite(float(out))


# ----------------------------------------------------- first-cycle sampler


def test_sample_first_cycle_no_perturb_linspace():
    near = jnp.full((3, 1), 2.0)
    far = jnp.full((3, 1), 6.0)
    t = sampling.sample_first_cycle(
        jax.random.PRNGKey(0), near, far, 8, perturb=False
    )
    np.testing.assert_allclose(t[0], np.linspace(2.0, 6.0, 9), atol=1e-6)


def test_sample_first_cycle_perturb_pins_endpoints():
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    t = sampling.sample_first_cycle(
        jax.random.PRNGKey(1), near, far, 8, perturb=True
    )
    t = np.asarray(t)
    np.testing.assert_allclose(t[:, 0], 2.0)
    np.testing.assert_allclose(t[:, -1], 6.0)
    assert (np.diff(t, axis=-1) > 0).all()


def test_sample_first_cycle_lindisp():
    near = jnp.full((1, 1), 2.0)
    far = jnp.full((1, 1), 6.0)
    t = sampling.sample_first_cycle(
        jax.random.PRNGKey(0), near, far, 4, lindisp=True, perturb=False
    )
    expect = 1.0 / np.linspace(1.0 / 2.0, 1.0 / 6.0, 5)
    np.testing.assert_allclose(t[0], expect, rtol=1e-5)


@requires_reference
def test_sample_first_cycle_parity_no_perturb(ref):
    import torch

    ref_samplers, _ = ref

    # Minimal duck-typed cfg tree for the reference sampler: it reads
    # cfg.nerf[mode]['num_coarse'], cfg.nerf[mode]['perturb'],
    # getattr(cfg.nerf, mode).lindisp, cfg.dataset.combined_sampling_method.
    class _Mode:
        lindisp = False

        def __getitem__(self, k):
            return {"num_coarse": 8, "perturb": False}[k]

    class _NerfNode:
        train = _Mode()

        def __getitem__(self, k):
            return _Mode()

    class _DS:
        combined_sampling_method = False

    class _Cfg:
        nerf = _NerfNode()
        dataset = _DS()

    cfg = _Cfg()

    near = torch.full((3, 1), 2.0)
    far = torch.full((3, 1), 6.0)
    out_ref = ref_samplers.sample_first_cycle(cfg, near, far, "train").numpy()

    out_jax = sampling.sample_first_cycle(
        jax.random.PRNGKey(0), jnp.full((3, 1), 2.0), jnp.full((3, 1), 6.0), 8,
        perturb=False,
    )
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-5, atol=1e-6)


@requires_reference
def test_dp_loss_js_variant_parity(ref):
    """The 'js' variant matches loss.py v6's mse branch (loss.py:468-470)."""
    import sys
    import torch

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import general_utils.loss as ref_loss

    rng = np.random.default_rng(11)
    n, s, m = 6, 8, 12
    t0, w0 = _histogram(rng, n, s)
    t1, w1 = _histogram(rng, n, m)
    mus = rng.uniform(0.2, 0.8, (n, s)).astype(np.float32)
    sigmas = rng.uniform(0.05, 0.5, (n, s)).astype(np.float32)
    lt, pib = mmath.truncated_gaussian_tails(jnp.asarray(mus), jnp.asarray(sigmas))
    lt, pib = np.asarray(lt), np.asarray(pib)

    class _C:
        class dataset:
            type = "llff"

        class train_params:
            mse = True

    out_ref = ref_loss.estimate_dp_loss_v6(
        torch.tensor(t1), torch.tensor(t0), torch.tensor(w1), torch.tensor(w0),
        torch.tensor(mus), torch.tensor(sigmas), torch.tensor(lt),
        torch.tensor(pib), _C,
    ).item()
    out_jax = dd.estimate_dp_loss(
        jnp.asarray(t1), jnp.asarray(t0), jnp.asarray(w1), jnp.asarray(w0),
        jnp.asarray(mus), jnp.asarray(sigmas), jnp.asarray(lt), jnp.asarray(pib),
        filter_empty_rays=False, variant="js",
    )
    np.testing.assert_allclose(float(out_jax), out_ref, rtol=2e-3, atol=1e-6)


@requires_reference
@pytest.mark.parametrize("padding", [True, False])
def test_sample_pdf_stochastic_distribution_parity(ref, padding):
    """det=False branches: same u-construction formulas -> the sample
    DISTRIBUTIONS must match even though the RNG streams differ.  Compared
    via per-section occupancy histograms over many draws."""
    import torch

    ref_samplers, _ = ref
    rng = np.random.default_rng(7)
    n, s, m = 512, 8, 16
    bins, weights = _histogram(rng, 1, s)
    bins = np.repeat(bins, n, 0)
    weights = np.repeat(weights, n, 0)

    torch.manual_seed(0)
    out_ref = ref_samplers.sample_pdf(
        torch.tensor(bins), torch.tensor(weights), m,
        _RefCfg(pdf_padding=padding), det=False,
    ).detach().numpy()
    out_jax = np.asarray(sampling.sample_pdf(
        jax.random.PRNGKey(5), jnp.asarray(bins), jnp.asarray(weights), m,
        pdf_padding=jnp.asarray(padding), det=False,
    ))

    edges = np.linspace(2.0, 6.0, 9)
    h_ref, _ = np.histogram(out_ref.ravel(), bins=edges, density=True)
    h_jax, _ = np.histogram(out_jax.ravel(), bins=edges, density=True)
    np.testing.assert_allclose(h_jax, h_ref, rtol=0.15, atol=0.02)


@requires_reference
def test_sample_pdf_mu_sigma_stochastic_distribution_parity(ref):
    import torch

    ref_samplers, _ = ref
    rng = np.random.default_rng(8)
    n, s, m = 512, 8, 16
    bins, weights, mus, sigmas, lt, pib = _dd_inputs(rng, 1, s)
    bins, weights = np.repeat(bins, n, 0), np.repeat(weights, n, 0)
    mus, sigmas = np.repeat(mus, n, 0), np.repeat(sigmas, n, 0)
    lt, pib = np.repeat(lt, n, 0), np.repeat(pib, n, 0)

    torch.manual_seed(0)
    out_ref = ref_samplers.sample_pdf_with_mu_sigma(
        torch.tensor(bins), torch.tensor(weights), torch.tensor(mus),
        torch.tensor(sigmas), torch.tensor(pib), torch.tensor(lt), m,
        _RefCfg(pdf_padding=True), det=False,
    ).detach().numpy()
    out_jax = np.asarray(sampling.sample_pdf_with_mu_sigma(
        jax.random.PRNGKey(9), jnp.asarray(bins), jnp.asarray(weights),
        jnp.asarray(mus), jnp.asarray(sigmas), jnp.asarray(pib), jnp.asarray(lt),
        m, near=2.0, far=6.0, pdf_padding=jnp.asarray(True), det=False,
    ))

    edges = np.linspace(2.0, 6.0, 9)
    h_ref, _ = np.histogram(out_ref.ravel(), bins=edges, density=True)
    h_jax, _ = np.histogram(out_jax.ravel(), bins=edges, density=True)
    np.testing.assert_allclose(h_jax, h_ref, rtol=0.15, atol=0.02)


def test_one_hot_gather_equals_take_along_axis():
    """Pin the one-hot-contraction optimization: for random sorted CDFs and
    u-vectors, the einsum fetch must equal take_along_axis exactly."""
    from ddnerf_tpu.core.sampling import _interval_index, _one_hot_of, _take

    rng = np.random.default_rng(123)
    for trial in range(5):
        n = int(rng.integers(1, 32))
        s = int(rng.integers(2, 40))
        m = int(rng.integers(1, 40))
        w = (rng.uniform(0, 1, (n, s)) ** 3 + 1e-4).astype(np.float32)
        pdf = w / w.sum(-1, keepdims=True)
        cdf = np.concatenate(
            [np.zeros((n, 1), np.float32),
             np.minimum(1.0, np.cumsum(pdf[:, :-1], -1)),
             np.ones((n, 1), np.float32)], axis=-1,
        )
        u = rng.uniform(0, 0.9999, (n, m)).astype(np.float32)

        ind = _interval_index(jnp.asarray(u), jnp.asarray(cdf))
        oh = _one_hot_of(ind, cdf.shape[-1])
        vals = rng.standard_normal((n, s + 1)).astype(np.float32)

        got = jnp.einsum("...ms,...s->...m", oh, jnp.asarray(vals))
        want = _take(jnp.asarray(vals), ind)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        # ind+1 via rolled one-hot
        got1 = jnp.einsum("...ms,...s->...m", jnp.roll(oh, 1, axis=-1),
                          jnp.asarray(vals))
        want1 = _take(jnp.asarray(vals), ind + 1)
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(want1))


def test_interval_one_hot_matches_clipped_index_fuzz():
    """interval_one_hot + fetch_sections must reproduce exact clipped-index
    gathers for both conventions (>= for CDF inverse, > for dp loss),
    including x below the first / above the last fence."""
    import numpy as np

    from ddnerf_tpu.core.sampling import fetch_sections, interval_one_hot

    rng = np.random.default_rng(7)
    for strict in (False, True):
        for _ in range(20):
            S = int(rng.integers(2, 12))
            M = int(rng.integers(1, 15))
            fences = np.sort(rng.standard_normal((3, S + 1)), axis=-1).astype(np.float32)
            # include values outside the fence range and exactly on fences
            x = rng.uniform(fences.min() - 1, fences.max() + 1, (3, M)).astype(np.float32)
            x[:, 0] = fences[:, 0]   # exactly on the first fence
            if M > 1:
                x[:, 1] = fences[:, -1]  # exactly on the last fence

            cmp = (x[:, None, :] > fences[..., None]) if strict else \
                  (x[:, None, :] >= fences[..., None])
            ind = np.clip(cmp.sum(axis=1) - 1, 0, S - 1)  # [3, M]

            vals = rng.standard_normal((3, S)).astype(np.float32)
            want = np.take_along_axis(vals, ind, axis=-1)

            oh = np.asarray(interval_one_hot(jnp.asarray(x), jnp.asarray(fences),
                                             strict=strict))
            assert set(np.unique(oh)) <= {0.0, 1.0}
            assert (oh.sum(-1) == 1).all()
            (got,) = fetch_sections(jnp.asarray(oh), jnp.asarray(vals))
            np.testing.assert_array_equal(np.asarray(got), want)


def test_fetch_sections_precision_switch():
    """Pin the FETCH_PRECISION='high' code path (CPU-exact: precision hints
    are no-ops off-TPU).  On chip HIGH is NOT gather-exact — the 3-pass
    decomposition keeps ~16 mantissa bits (measured ~1.5e-7 warm-loss shift,
    PERF.md round-4) — which is why sample_pdf_with_mu_sigma clamps frac."""
    from ddnerf_tpu.core import sampling as S

    rng = np.random.default_rng(7)
    fences = np.sort(rng.uniform(0, 1, (4, 9)).astype(np.float32), axis=-1)
    x = rng.uniform(0, 1, (4, 13)).astype(np.float32)
    vals = rng.standard_normal((4, 8)).astype(np.float32)
    oh = S.interval_one_hot(jnp.asarray(x), jnp.asarray(fences))
    prev = S.FETCH_PRECISION
    try:
        S.FETCH_PRECISION = "highest"
        (a,) = S.fetch_sections(oh, jnp.asarray(vals))
        S.FETCH_PRECISION = "high"
        (b,) = S.fetch_sections(oh, jnp.asarray(vals))
        S.FETCH_PRECISION = "mixed"
        (c,) = S.fetch_sections(oh, jnp.asarray(vals))
    finally:
        S.FETCH_PRECISION = prev
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # "mixed" (the production default) is gather-exact BY CONSTRUCTION on
    # every backend: the one-hot lhs is 0/1 (one bf16 pass) and the 3-split
    # rhs covers all 24 f32 mantissa bits.  Verified 0 ulp on real TPU at
    # production shapes (PERF.md round-4); here we pin the CPU path.
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_mu_sigma_resampler_survives_inexact_fetch():
    """The frac clamp must keep the inverse CDF in-domain when the fetched
    cdf values carry the HIGH-precision fetch's ~2^-16 relative error
    (simulated by perturbing fetch_sections outputs), instead of NaN-ing
    through erfinv outside (-1, 1)."""
    from ddnerf_tpu.core import sampling as S
    from ddnerf_tpu.core.math import truncated_gaussian_tails

    rng = np.random.default_rng(3)
    n, s, m = 8, 16, 33
    bins = np.sort(rng.uniform(2.0, 6.0, (n, s + 1)).astype(np.float32), -1)
    bins[:, 0], bins[:, -1] = 2.0, 6.0
    w = (rng.uniform(0, 1, (n, s)) ** 5).astype(np.float32)
    mus = jnp.asarray(rng.uniform(0, 1, (n, s)).astype(np.float32))
    sigmas = jnp.asarray(rng.uniform(0.001, 1.0, (n, s)).astype(np.float32))
    lt, pib = truncated_gaussian_tails(mus, sigmas)

    real_fetch = S.fetch_sections

    def noisy_fetch(oh, *arrays, precision="highest"):
        outs = list(real_fetch(oh, *arrays, precision=precision))
        # Push the fetched cdf_g0 (index 2 in the resampler's fetch) above
        # u for every sample near its interval's start — the exact hazard
        # observed with plain bf16 on v5e.  The magnitude is exaggerated
        # vs HIGH's real ~2^-16 error so boundary hits are certain; the
        # frac clamp is magnitude-independent.
        outs[2] = outs[2] + 0.02
        return tuple(outs)

    S.fetch_sections = noisy_fetch
    try:
        for det in (True, False):
            out = np.asarray(S.sample_pdf_with_mu_sigma(
                jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(w),
                mus, sigmas, pib, lt, m,
                near=2.0, far=6.0, pdf_padding=jnp.asarray(True), det=det,
            ))
            assert np.isfinite(out).all()
            assert (out >= 2.0).all() and (out <= 6.0).all()
    finally:
        S.fetch_sections = real_fetch


def test_resampler_output_already_sorted():
    """The truncated-Gaussian resampler's output is sorted BEFORE the
    defensive jnp.sort (SKIP_RESAMPLER_SORT rationale): fuzz both
    pdf_padding modes, det and stochastic, incl. degenerate flat-CDF and
    near-saturated weights."""
    from ddnerf_tpu.core import sampling as S
    from ddnerf_tpu.core.math import truncated_gaussian_tails

    rng = np.random.default_rng(11)
    prev = S.SKIP_RESAMPLER_SORT
    try:
        for trial in range(8):
            n, s, m = 16, int(rng.integers(2, 34)), int(rng.integers(2, 40))
            bins = np.sort(
                rng.uniform(2.0, 6.0, (n, s + 1)).astype(np.float32), axis=-1
            )
            bins[:, 0], bins[:, -1] = 2.0, 6.0
            w = (rng.uniform(0, 1, (n, s)) ** 5).astype(np.float32)
            w[0] = 0.0  # fully degenerate ray
            w[1, : s // 2] = 0.0  # flat CDF prefix
            mus = jnp.asarray(rng.uniform(0, 1, (n, s)).astype(np.float32))
            sigmas = jnp.asarray(
                rng.uniform(0.001, 1.0, (n, s)).astype(np.float32)
            )
            lt, pib = truncated_gaussian_tails(mus, sigmas)
            for det in (True, False):
                for pad in (True, False):
                    kw = dict(
                        near=2.0, far=6.0,
                        pdf_padding=jnp.asarray(pad), det=det,
                    )
                    key = jax.random.PRNGKey(trial)
                    S.SKIP_RESAMPLER_SORT = True
                    raw = np.asarray(S.sample_pdf_with_mu_sigma(
                        key, jnp.asarray(bins), jnp.asarray(w), mus, sigmas,
                        pib, lt, m, **kw))
                    S.SKIP_RESAMPLER_SORT = False
                    srt = np.asarray(S.sample_pdf_with_mu_sigma(
                        key, jnp.asarray(bins), jnp.asarray(w), mus, sigmas,
                        pib, lt, m, **kw))
                    assert (np.diff(raw, axis=-1) >= 0).all(), (trial, det, pad)
                    np.testing.assert_array_equal(raw, srt)
    finally:
        S.SKIP_RESAMPLER_SORT = prev
