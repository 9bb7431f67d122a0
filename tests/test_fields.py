"""Gaussian random fields: rms scaling, divergence cleaning, vector
potential, spectrum shape, I/O, particle mapping (reference fields.py)."""

import numpy as np
import pytest

import cluster_generator_tpu as cg

LE, RE, DD = [0.0] * 3, [1000.0] * 3, [48, 48, 48]


@pytest.fixture(scope="module")
def bfield():
    return cg.RandomMagneticField(LE, RE, DD, 50.0, 500.0, 1.0e-6, prng=11)


def test_rms_scaling(bfield):
    g2 = (bfield["magnetic_field_x"] ** 2 + bfield["magnetic_field_y"] ** 2
          + bfield["magnetic_field_z"] ** 2)
    assert np.sqrt(g2.mean()) == pytest.approx(1.0e-6, rel=1e-10)


def test_divergence_free(bfield):
    """Central-difference divergence (the operator the sin(k d)/d projection
    nulls) vanishes to roundoff."""
    gx = bfield["magnetic_field_x"]
    gy = bfield["magnetic_field_y"]
    gz = bfield["magnetic_field_z"]
    div = ((np.roll(gx, -1, 0) - np.roll(gx, 1, 0)) / (2 * bfield.dx)
           + (np.roll(gy, -1, 1) - np.roll(gy, 1, 1)) / (2 * bfield.dy)
           + (np.roll(gz, -1, 2) - np.roll(gz, 1, 2)) / (2 * bfield.dz))
    scale = np.abs(gx).mean() / bfield.dx
    assert np.abs(div).max() / scale < 1e-10


def test_padding_and_grid():
    f = cg.RandomVelocityField(LE, RE, DD, 50.0, 500.0, 100.0, padding=0.1,
                               prng=3)
    assert (f.ddims == np.array(DD) + 2 * np.ceil(0.05 * np.array(DD))).all()
    assert f.left_edge[0] < 0.0 and f.right_edge[0] > 1000.0
    assert f["x"].size == f.ddims[0]


def test_vector_potential_curl_recovers_field():
    """Spectral curl of A equals the continuous-k solenoidal projection of
    the div-cleaned B.  (B itself is cleaned with finite-difference
    wavenumbers sin(k d)/d — same as the reference, fields.py:164-190 — so
    curl A == B exactly only in the d->0 limit; the FD/continuous mismatch
    is a few percent at the grid scale.)"""
    prng = 5
    B = cg.RandomMagneticField(LE, RE, DD, 100.0, 500.0, 1.0e-6, prng=prng)
    A = cg.RandomMagneticVectorPotential(LE, RE, DD, 100.0, 500.0, 1.0e-6,
                                         prng=prng)
    # same seed => same underlying random field
    kx, ky, kz = A._compute_waves()
    ax = np.fft.fftn(A["magnetic_vector_potential_x"])
    ay = np.fft.fftn(A["magnetic_vector_potential_y"])
    az = np.fft.fftn(A["magnetic_vector_potential_z"])
    curl_x = np.fft.ifftn(1j * (ky * az - kz * ay)).real
    curl_y = np.fft.ifftn(1j * (kz * ax - kx * az)).real
    curl_z = np.fft.ifftn(1j * (kx * ay - ky * ax)).real

    # exact identity: curl A == P_k[B] (continuous-k projection)
    bxh = np.fft.fftn(B["magnetic_field_x"])
    byh = np.fft.fftn(B["magnetic_field_y"])
    bzh = np.fft.fftn(B["magnetic_field_z"])
    k2 = kx**2 + ky**2 + kz**2
    k2 = np.where(k2 > 0, k2, 1.0)
    kb = (kx * bxh + ky * byh + kz * bzh) / k2
    # the .real truncation of A drops the (self-conjugate) Nyquist planes —
    # inherent to a discrete spectral curl; compare non-Nyquist modes only
    nx, ny, nz = B.ddims
    mask = np.ones((nx, ny, nz), bool)
    mask[nx // 2, :, :] = False
    mask[:, ny // 2, :] = False
    mask[:, :, nz // 2] = False
    cxh = np.fft.fftn(curl_x)
    cyh = np.fft.fftn(curl_y)
    czh = np.fft.fftn(curl_z)
    scale = np.abs(bxh[mask]).max()
    assert np.abs(cxh[mask] - (bxh - kx * kb)[mask]).max() / scale < 1e-8
    assert np.abs(cyh[mask] - (byh - ky * kb)[mask]).max() / scale < 1e-8
    assert np.abs(czh[mask] - (bzh - kz * kb)[mask]).max() / scale < 1e-8

    # and curl A approximates B itself to the FD/continuous-k mismatch
    rms = np.sqrt((B["magnetic_field_x"]**2).mean())
    assert np.sqrt(((curl_x - B["magnetic_field_x"])**2).mean()) / rms < 0.1


def test_spectrum_slope():
    """Power spectrum follows k^alpha between k1 and k0 (Kolmogorov)."""
    f = cg.RandomVelocityField([0] * 3, [1000.0] * 3, [64] * 3, 31.25, 1000.0,
                               1.0, padding=0.0, prng=17)
    gx = f["velocity_x"]
    W = np.abs(np.fft.fftn(gx)) ** 2
    kx, ky, kz = f._compute_waves()
    kk = np.sqrt(kx**2 + ky**2 + kz**2)
    k1 = 2 * np.pi / 1000.0
    k0 = 2 * np.pi / 31.25
    sel = (kk > 4 * k1) & (kk < k0 / 4)
    logk = np.log(kk[sel])
    logP = np.log(W[sel])
    slope = np.polyfit(logk, logP, 1)[0]
    assert -4.5 < slope < -3.0, slope  # -11/3 expected


def test_radial_scaling_profile(canonical_model):
    B = cg.RadialRandomMagneticField(LE, RE, DD, 50.0, 500.0,
                                     [500.0, 500.0, 500.0], canonical_model,
                                     prng=23)
    gx, gy, gz = (B["magnetic_field_x"], B["magnetic_field_y"],
                  B["magnetic_field_z"])
    mag = np.sqrt(gx**2 + gy**2 + gz**2)
    x, y, z = np.meshgrid(B["x"], B["y"], B["z"], indexing="ij")
    rr = np.sqrt((x - 500) ** 2 + (y - 500) ** 2 + (z - 500) ** 2)
    Bprof = np.interp(rr, np.asarray(canonical_model["radius"]),
                      np.asarray(canonical_model["magnetic_field_strength"]))
    # field amplitude should track the radial profile (within GRF scatter):
    # ratio of shell means inner vs outer matches profile ratio within 3x
    inner = rr < 200
    outer = (rr > 600) & (rr < 700)
    got = mag[inner].mean() / mag[outer].mean()
    want = Bprof[inner].mean() / Bprof[outer].mean()
    assert 0.3 < got / want < 3.0


def test_write_hdf5_and_fortran(bfield, tmp_path):
    import h5py

    fn = str(tmp_path / "b.h5")
    bfield.write_file(fn)
    with h5py.File(fn) as f:
        assert f.attrs["name"] == "magnetic_field"
        assert f.attrs["divergence_clean"] == 1
        assert f["magnetic_field_x"].shape == tuple(bfield.ddims)
        assert f["x"].size == bfield.ddims[0]
    with pytest.raises(IOError):
        bfield.write_file(fn)

    fn2 = str(tmp_path / "b.dat")
    bfield.write_file(fn2, format="fortran")
    from scipy.io import FortranFile

    with FortranFile(fn2, "r") as f:
        n = f.read_ints()[0]
        assert n == bfield.ddims[0]


def test_map_field_to_particles(bfield, canonical_model):
    p = canonical_model.generate_gas_particles(5000, r_max=400.0, prng=31)
    p.add_offsets([500.0, 500.0, 500.0], [0.0] * 3)
    bfield.map_field_to_particles(p)
    v = p["gas", "magnetic_field"]
    assert v.shape == (5000, 3)
    assert np.isfinite(v).all()
    assert np.abs(v).max() > 0
    # spot-check one particle against scipy's interpolator
    from scipy.interpolate import RegularGridInterpolator

    rgi = RegularGridInterpolator((bfield["x"], bfield["y"], bfield["z"]),
                                  bfield["magnetic_field_x"],
                                  bounds_error=False, fill_value=0.0)
    ref = rgi(p["gas", "particle_position"][:50])
    assert np.allclose(v[:50, 0], ref, rtol=1e-8, atol=1e-20)


def test_velocity_field_units_name():
    f = cg.RandomVelocityField(LE, RE, [16] * 3, 100.0, 500.0, 0.1, prng=2)
    assert f._name == "velocity"
    assert f.units == "kpc/Myr"
    assert "velocity_x" in f.comps


def test_write_file_units(bfield, tmp_path):
    import h5py

    fn = str(tmp_path / "b_units.h5")
    bfield.write_file(fn, field_unit="uG", length_unit="Mpc")
    with h5py.File(fn) as f:
        # coordinates in Mpc (grid spans ~1 Mpc + padding)
        assert np.abs(np.asarray(f["x"][()])).max() < 2.0
        # field stored in microgauss: rms 1e-6 G -> ~1 uG
        bx = np.asarray(f["magnetic_field_x"][()])
        assert 0.05 < np.sqrt((bx**2).mean()) < 5.0


def test_map_field_units_kwarg(bfield, canonical_model):
    """The units= kwarg converts through to set_field (it was silently
    ignored): the stored particle values are identical for any compatible
    unit, and an unknown unit raises."""
    p1 = canonical_model.generate_gas_particles(500, r_max=400.0, prng=44)
    p2 = canonical_model.generate_gas_particles(500, r_max=400.0, prng=44)
    bfield.map_field_to_particles(p1, ptype="gas")
    bfield.map_field_to_particles(p2, ptype="gas", units="uG")
    np.testing.assert_allclose(p1["gas", "magnetic_field"],
                               p2["gas", "magnetic_field"], rtol=1e-12)
    with pytest.raises(KeyError):
        bfield.map_field_to_particles(p1, ptype="gas", units="furlongs")
    # dimensionally wrong units raise instead of silently converting
    # with a factor ratio of known-but-incompatible units
    with pytest.raises(ValueError, match="not convertible"):
        bfield.map_field_to_particles(p1, ptype="gas", units="kpc/Myr")


def test_vector_potential_map_field_units(canonical_model):
    """Mapping a vector potential with units= works ('gauss*kpc' is a
    real registry unit — it used to KeyError) and a bare field-strength
    target for a potential raises on dimensions."""
    p = canonical_model.generate_gas_particles(400, r_max=400.0, prng=3)
    p2 = canonical_model.generate_gas_particles(400, r_max=400.0, prng=3)
    A = cg.RandomMagneticVectorPotential(LE, RE, [16] * 3, 50.0, 500.0,
                                         5e-6, prng=11)
    assert A.units == "gauss*kpc"
    A.map_field_to_particles(p, ptype="gas")
    A.map_field_to_particles(p2, ptype="gas", units="uG*kpc")
    np.testing.assert_allclose(p["gas", "magnetic_vector_potential"],
                               p2["gas", "magnetic_vector_potential"],
                               rtol=1e-12)
    with pytest.raises(ValueError, match="not convertible"):
        A.map_field_to_particles(p, ptype="gas", units="uG")


def test_halo_slots_bind_by_position():
    """Halo arguments validate per SLOT: a partially-given slot raises
    (it used to silently drop the halo or crash in np.asarray(None)),
    and a fully-given later slot is honored."""
    rr = np.linspace(1.0, 800.0, 64)
    gg = 1e-6 * np.exp(-rr / 300.0)
    with pytest.raises(ValueError, match="partially specified"):
        cg.GaussianRandomField(LE, RE, [16] * 3, 50.0, 500.0,
                               ctr1=[500.0] * 3, g1=gg, prng=1)
    with pytest.raises(ValueError, match="halo 2"):
        cg.GaussianRandomField(LE, RE, [16] * 3, 50.0, 500.0,
                               ctr1=[500.0] * 3, r1=rr, g1=gg,
                               ctr2=[200.0] * 3, g2=gg, prng=1)
    # two fully-specified slots -> both halos shape the field
    f2 = cg.GaussianRandomField(LE, RE, [16] * 3, 50.0, 500.0,
                                ctr1=[300.0] * 3, r1=rr, g1=gg,
                                ctr2=[700.0] * 3, r2=rr, g2=gg, prng=5)
    f1 = cg.GaussianRandomField(LE, RE, [16] * 3, 50.0, 500.0,
                                ctr1=[300.0] * 3, r1=rr, g1=gg, prng=5)
    assert not np.allclose(f2["vector_x"], f1["vector_x"])
    # r_max accepts (value, unit) tuples like every other length arg
    cg.GaussianRandomField(LE, RE, [16] * 3, 50.0, 500.0,
                           ctr1=[300.0] * 3, r1=rr, g1=gg,
                           r_max=(0.4, "Mpc"), prng=5)


def test_tuple_unit_inputs(canonical_model):
    """(value, unit) tuples convert for amplitudes and halo parameters,
    like the reference's parse_value (they once crashed for g_rms/ctr)."""
    f1 = cg.RandomMagneticField(LE, RE, [16] * 3, 50.0, 500.0,
                                (5.0, "uG"), prng=7)
    f2 = cg.RandomMagneticField(LE, RE, [16] * 3, 50.0, 500.0,
                                5.0e-6, prng=7)
    # 5.0 * (1 uG) and the literal 5.0e-6 differ by 1 ulp, which blows
    # the RELATIVE error only on near-zero cells — hence the atol
    np.testing.assert_allclose(f1["magnetic_field_x"],
                               f2["magnetic_field_x"], rtol=1e-12,
                               atol=1e-20)
    rr = np.asarray(canonical_model["radius"])
    bb = np.asarray(canonical_model["magnetic_field_strength"])
    g1 = cg.RadialRandomMagneticField(
        LE, RE, [16] * 3, 50.0, 500.0, ((0.5, 0.5, 0.5), "Mpc"),
        (rr, bb), prng=9)
    g2 = cg.RadialRandomMagneticField(
        LE, RE, [16] * 3, 50.0, 500.0, [500.0] * 3, (rr, bb), prng=9)
    np.testing.assert_allclose(g1["magnetic_field_x"],
                               g2["magnetic_field_x"], rtol=1e-12,
                               atol=1e-20)


def test_rfft_staged_grf_matches_fused():
    """The staged rfft half-spectrum route (3 fwd + k-math + 3 inv
    programs; VERDICT r3 item 3) produces the SAME field as the fused
    c64 route for the same key — the imaginary half of a real field's
    spectrum is redundant.  Even and odd z dims (the Parseval plane
    weights and irfft length differ)."""
    from cluster_generator_tpu.fields.grf import RandomMagneticField

    for dims in [(32, 32, 32), (16, 16, 14)]:
        import jax.numpy as jnp

        kw = dict(padding=0.0, prng=42, dtype=jnp.float32)
        f1 = RandomMagneticField([-500.0] * 3, [500.0] * 3, dims,
                                 50.0, 200.0, 1.0e-6, use_rfft=False, **kw)
        f2 = RandomMagneticField([-500.0] * 3, [500.0] * 3, dims,
                                 50.0, 200.0, 1.0e-6, use_rfft=True, **kw)
        for a, b in [(f1.gx, f2.gx), (f1.gy, f2.gy), (f1.gz, f2.gz)]:
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a - b).max() / np.abs(a).max() < 1e-4
