"""Unit tests for the spectral transform core (reference L2 layer:
legendre.f90 / fourier.f90 / spectral.f90). Spectral fields use the packed
real [mx, nx, 2] representation (no complex dtype on the TPU backend)."""
import numpy as np
import jax.numpy as jnp
import pytest

from speedy_tpu.config import t30
from speedy_tpu.geometry import build_geometry_np
from speedy_tpu.ops import spectral as sp

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def cfg():
    return t30(precision="fp64")


@pytest.fixture(scope="module")
def geom(cfg):
    return build_geometry_np(cfg)


@pytest.fixture(scope="module")
def sc(cfg, geom):
    return sp.build_spectral(cfg, geom)


@pytest.fixture(scope="module")
def tables(cfg, geom):
    return sp.build_spectral_np(cfg, geom)


def random_spec_c(cfg, seed=0, levels=None):
    """Random complex spectral field with triangular support l <= trunc."""
    rng = np.random.default_rng(seed)
    shape = (cfg.mx, cfg.nx) if levels is None else (levels, cfg.mx, cfg.nx)
    s = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    m0 = np.arange(cfg.mx)[:, None]
    n0 = np.arange(cfg.nx)[None, :]
    s = s * ((m0 + n0) <= cfg.trunc)
    s[..., 0, :] = s[..., 0, :].real  # m=0 coefficients of a real field are real
    return s


def random_spec(cfg, seed=0, levels=None):
    return sp.from_complex(random_spec_c(cfg, seed, levels))


def single_mode(cfg, m, n, dtype=jnp.float64):
    x = jnp.zeros((cfg.mx, cfg.nx, 2), dtype=dtype)
    return x.at[m, n, 0].set(1.0)


def test_packed_helpers():
    c = np.array([[1 + 2j, 3 - 4j]])
    p = sp.from_complex(c)
    np.testing.assert_array_equal(np.asarray(p), [[[1, 2], [3, -4]]])
    np.testing.assert_array_equal(np.asarray(sp.to_complex(p)), c)
    # i * (1+2i) = -2 + i
    np.testing.assert_array_equal(
        np.asarray(sp.to_complex(sp.cmul_i(p))), 1j * c)


def test_gauss_weights_sum_to_one(tables):
    # Hemispheric Gaussian weights integrate the constant exactly
    # (legendre.f90:162 "sum should equal 1.0").
    assert abs(tables["wt"].sum() - 1.0) < 1e-12


def test_legendre_orthonormality(cfg, tables, geom):
    # The quadrature pairs iterated-node weights with approximate-node
    # polynomials (the reference's deliberate quirk), so orthonormality holds
    # only to the node-approximation error, not machine precision.
    eps = sp.epsilon_table(cfg.mx, cfg.nx)
    poly = sp.legendre_polys(cfg, geom["sia_half"], geom["coa_half"], eps)
    wt = tables["wt"]
    for m in (0, 1, 5, 15, 30):
        nmax = cfg.trunc + 1 - m
        P = poly[m, : nmax + 1]  # [n, iy]
        gram = 2.0 * np.einsum("nj,kj,j->nk", P, P, wt)
        same_parity = (np.add.outer(np.arange(nmax + 1),
                                    np.arange(nmax + 1)) % 2) == 0
        err = np.abs(gram - np.eye(nmax + 1))[same_parity].max()
        # ~3e-3 at m=0: node error ~5e-5 amplified by O(l^2) polynomial
        # slopes. Verified separately that the same recurrence at iterated
        # nodes is orthonormal to 4e-15.
        assert err < 5e-3, (m, err)


def test_fourier_roundtrip_and_packing(cfg, sc):
    # fourier_dir should agree with a direct DFT definition: coefficient m is
    # (1/ix) * sum_i f(x_i) exp(-i m x_i)  (fourier.f90:56-82 + FFTPACK).
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.normal(size=(cfg.il, cfg.ix)))
    fm = np.asarray(sp.to_complex(sp.fourier_dir(sc, g)))
    i = np.arange(cfg.ix)
    for m in (0, 1, 7, 30):
        expected = (np.asarray(g) * np.exp(-2j * np.pi * m * i / cfg.ix)).sum(
            axis=-1) / cfg.ix
        np.testing.assert_allclose(fm[:, m], expected, atol=1e-12)
    # inverse of the truncated coefficients reproduces a band-limited signal
    x = 2 * np.pi * i / cfg.ix
    band = jnp.asarray(np.cos(3 * x)[None, :] + 0.5 * np.sin(17 * x)[None, :]
                       + np.ones((cfg.il, 1)))
    back = sp.fourier_inv(sc, sp.fourier_dir(sc, band))
    np.testing.assert_allclose(np.asarray(back), np.asarray(band), atol=1e-12)


def test_transform_roundtrip_spec(cfg, sc):
    # spec -> grid -> spec on triangularly-truncated input. Exactness is
    # limited by the reference's approximate polynomial nodes.
    s = random_spec(cfg, seed=2)
    g = sp.spec_to_grid(sc, s)
    s2 = sp.grid_to_spec(sc, g)
    err = np.abs(np.asarray(s2 - s)).max() / np.abs(np.asarray(s)).max()
    # ~4e-3: the reference's approximate-node quirk. The same build with
    # Newton-iterated nodes round-trips at 3.5e-15 (verified in dev); the
    # quirk is kept deliberately for parity with geometry.f90:68.
    assert err < 1e-2, err


def test_transform_roundtrip_batched(cfg, sc):
    s = random_spec(cfg, seed=3, levels=8)
    g = sp.spec_to_grid(sc, s)
    assert g.shape == (8, cfg.il, cfg.ix)
    s2 = sp.grid_to_spec(sc, g)
    err = np.abs(np.asarray(s2 - s)).max() / np.abs(np.asarray(s)).max()
    assert err < 1e-2  # approximate-node quirk, see above

    # batching is exactly consistent with per-level transforms
    g0 = sp.spec_to_grid(sc, s[3])
    np.testing.assert_allclose(np.asarray(g[3]), np.asarray(g0), atol=1e-12)


def test_laplacian_eigenvalues(cfg, sc):
    from speedy_tpu.constants import REARTH
    s = random_spec(cfg, seed=4)
    lap = np.asarray(sp.laplacian(sc, s))
    m0 = np.arange(cfg.mx)[:, None, None]
    n0 = np.arange(cfg.nx)[None, :, None]
    ell = m0 + n0
    expected = -np.asarray(s) * ell * (ell + 1) / REARTH**2
    np.testing.assert_allclose(lap, expected, rtol=1e-12)
    # inverse_laplacian undoes laplacian away from l=0
    s00 = np.asarray(sp.inverse_laplacian(sc, jnp.asarray(lap)))
    mask = np.broadcast_to(ell > 0, s00.shape)
    np.testing.assert_allclose(s00[mask], np.asarray(s)[mask], rtol=1e-10)


def test_uvspec_vdspec_chain_identity(cfg, sc):
    # The wind decomposition chain the dynamics relies on
    # (tendencies.f90:97-101 + 212-216): (vor, div) -> uvspec -> grid U,V ->
    # vdspec -> (vor, div). vds alone is NOT the inverse of uvspec: it acts
    # on coefficients of u/cos(lat) (the cosgr2 pre-scaling inside vdspec,
    # spectral.f90:216-221). The (0,0) coefficients are zeroed: global means
    # of curl/divergence vanish for any physical wind field (Stokes); all
    # other triangle modes are exact at interior (verified mode-by-mode).
    vor = jnp.asarray(random_spec(cfg, seed=5)).at[0, 0].set(0.0)
    div = jnp.asarray(random_spec(cfg, seed=6)).at[0, 0].set(0.0)
    ucosm, vcosm = sp.uvspec(sc, vor, div)
    ug = sp.spec_to_grid(sc, ucosm)   # = u * cos(lat) on the grid
    vg = sp.spec_to_grid(sc, vcosm)
    # u*cos * cosgr2 = u/cos: the non-half_cos branch
    vor2, div2 = sp.vdspec(sc, ug, vg, half_cos_scaling=False)
    m0 = np.arange(cfg.mx)[:, None, None]
    n0 = np.arange(cfg.nx)[None, :, None]
    interior = np.broadcast_to(
        ((m0 + n0) <= cfg.trunc - 1) & (n0 < cfg.nx - 2), vor.shape)
    scale = np.abs(np.asarray(vor)).max()
    for a, b in ((vor, vor2), (div, div2)):
        err = np.abs(np.asarray(a - b))[interior].max() / scale
        # bounded by the approximate-node quadrature quirk (~3e-3)
        assert err < 2e-2, err


def test_grad_zonal_derivative(cfg, sc):
    # d/dlon of a single zonal harmonic: psdx = i*m/a * psi.
    from speedy_tpu.constants import REARTH
    s = random_spec(cfg, seed=7)
    psdx, psdy = sp.grad(sc, s)
    m0 = np.arange(cfg.mx)[:, None]
    expected = 1j * m0 / REARTH * np.asarray(sp.to_complex(s))
    np.testing.assert_allclose(
        np.asarray(sp.to_complex(psdx)), expected, rtol=1e-12)
    # meridional part maps parity n -> n±1: check it only couples adjacent n
    one = single_mode(t30(precision="fp64"), 4, 6)
    _, py = sp.grad(sc, one)
    nz = np.nonzero(np.abs(np.asarray(sp.to_complex(py))) > 0)
    assert set(nz[0].tolist()) <= {4}
    assert set(nz[1].tolist()) <= {5, 7}


def test_vdspec_consistency_with_transform_path(cfg, sc):
    # vdspec kcos=2 path equals manual cosgr scaling + transform + vds.
    rng = np.random.default_rng(8)
    ug = jnp.asarray(rng.normal(size=(cfg.il, cfg.ix)))
    vg = jnp.asarray(rng.normal(size=(cfg.il, cfg.ix)))
    vorm, divm = sp.vdspec(sc, ug, vg, half_cos_scaling=True)
    su = sp.grid_to_spec(sc, ug * sc.cosgr[:, None])
    sv = sp.grid_to_spec(sc, vg * sc.cosgr[:, None])
    vorm2, divm2 = sp.vds(sc, su, sv)
    np.testing.assert_allclose(np.asarray(vorm), np.asarray(vorm2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(divm), np.asarray(divm2), atol=1e-12)


def test_trunct(cfg, sc):
    s = jnp.ones((cfg.mx, cfg.nx, 2), dtype=jnp.float64)
    t = np.asarray(sp.trunct(sc, s))
    m0 = np.arange(cfg.mx)[:, None]
    n0 = np.arange(cfg.nx)[None, :]
    np.testing.assert_array_equal(t[..., 0], ((m0 + n0) <= cfg.trunc))


def test_fp32_tables_build(geom):
    cfg32 = t30(precision="fp32")
    sc32 = sp.build_spectral(cfg32, geom)
    assert sc32.cpol_inv.dtype == jnp.float32
    s = random_spec(cfg32, seed=9).astype(jnp.float32)
    g = sp.spec_to_grid(sc32, s)
    assert g.dtype == jnp.float32
    s2 = sp.grid_to_spec(sc32, g)
    err = np.abs(np.asarray(s2 - s)).max() / np.abs(np.asarray(s)).max()
    assert err < 1e-2


def test_pallas_fused_transforms_match_einsum_path(geom):
    """The experimental fused Pallas kernels (ops/pallas_transforms.py)
    reproduce the production einsum path — run in interpret mode so the
    CPU CI exercises the kernel logic (the module docstring records why
    they are not the production path on real TPUs)."""
    from jax.experimental.pallas import tpu as pltpu
    from speedy_tpu.ops import pallas_transforms as pt

    cfg32 = t30(precision="fp32")
    sc32 = sp.build_spectral(cfg32, geom)
    ft = pt.build_fused_tables(sc32)
    rng = np.random.default_rng(3)
    b = 6
    spec = jnp.asarray(rng.standard_normal((b, cfg32.mx, cfg32.nx, 2)),
                       jnp.float32)
    grid = jnp.asarray(rng.standard_normal((b, cfg32.il, cfg32.ix)),
                       jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        g_p = pt.fused_spec_to_grid(ft, spec, cfg32.il, cfg32.ix)
        s_p = pt.fused_grid_to_spec(ft, grid, cfg32.mx, cfg32.nx)
    g_ref = sp.spec_to_grid(sc32, spec)
    s_ref = sp.grid_to_spec(sc32, grid)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_ref),
                               rtol=1e-5, atol=1e-6)
