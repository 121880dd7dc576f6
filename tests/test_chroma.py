"""Chroma tests (model: reference tests/chroma_tests.rs)."""

import numpy as np
import pytest

import spectrograms_tpu as sg
from conftest import sine

SR = 16000.0
STFT = sg.StftParams(2048, 512)

# pitch classes: 0=C … 9=A
A4_IDX = 9
C_IDX = 0


def test_chroma_shape():
    c = sg.compute_chromagram(sine(440.0), STFT, SR, dtype="float64")
    assert c.n_bins == 12
    assert c.shape[0] == sg.N_CHROMA


def test_440_peaks_at_A():
    c = sg.compute_chromagram(sine(440.0), STFT, SR, dtype="float64")
    assert int(np.argmax(np.asarray(c.data).mean(axis=1))) == A4_IDX


def test_261_peaks_at_C():
    c = sg.compute_chromagram(sine(261.63), STFT, SR, dtype="float64")
    assert int(np.argmax(np.asarray(c.data).mean(axis=1))) == C_IDX


@pytest.mark.parametrize("norm,check", [
    (sg.ChromaNorm.L1, lambda v: np.allclose(v.sum(axis=0), 1.0, atol=1e-6)),
    (sg.ChromaNorm.L2, lambda v: np.allclose(np.sqrt((v**2).sum(axis=0)), 1.0, atol=1e-6)),
    (sg.ChromaNorm.MAX, lambda v: np.allclose(v.max(axis=0), 1.0, atol=1e-6)),
])
def test_normalization(norm, check):
    params = sg.ChromaParams.music_standard().with_norm(norm)
    c = np.asarray(sg.compute_chromagram(sine(440.0), STFT, SR, params, dtype="float64").data)
    assert check(c)


def test_norm_none_unnormalized():
    params = sg.ChromaParams.music_standard().with_norm(sg.ChromaNorm.NONE)
    c = np.asarray(sg.compute_chromagram(sine(440.0), STFT, SR, params, dtype="float64").data)
    assert not np.allclose(np.sqrt((c**2).sum(axis=0)), 1.0, atol=1e-3)


def test_from_spectrogram_dimension_check():
    with pytest.raises(sg.DimensionMismatchError):
        sg.chromagram_from_spectrogram(np.zeros((100, 5)), SR, 2048)


def test_zero_signal_no_nan():
    c = np.asarray(sg.compute_chromagram(np.zeros(8000), STFT, SR, dtype="float64").data)
    assert np.all(np.isfinite(c))


def test_chroma_plan_precision_kwarg():
    """precision plumbs to the helper plan and the fused-kernel pass count;
    HIGHEST forces the full-accuracy matmul path (never pallas)."""
    import jax

    x = sine(440.0).astype(np.float32)
    hi = sg.ChromaPlan(STFT, SR, dtype="float32")
    lo = sg.ChromaPlan(
        STFT, SR, dtype="float32", precision=jax.lax.Precision.DEFAULT
    )
    highest = sg.ChromaPlan(
        STFT, SR, dtype="float32", precision=jax.lax.Precision.HIGHEST
    )
    assert not highest._pallas_factored
    a = np.asarray(hi.compute(x).data)
    b = np.asarray(lo.compute(x).data)
    c = np.asarray(highest.compute(x).data)
    for other in (b, c):
        assert np.abs(a - other).max() <= 1e-3 * np.abs(a).max()


class TestMultirateChroma:
    """ChromaParams(multirate=True): band-limited chroma on a 2^d-decimated
    signal — same bin grid, same frame grid, ~4^d× less DFT work."""

    SR44 = 44100.0
    STFT44 = sg.StftParams(4096, 1024)

    @staticmethod
    def _music(n_sec=1.0):
        t = np.arange(int(44100 * n_sec)) / 44100.0
        return sum(
            np.sin(2 * np.pi * 220.0 * k * t + k) / k for k in range(1, 18)
        ).astype(np.float32)

    def test_depth_selection(self):
        from spectrograms_tpu.chroma import chroma_decimation_depth

        # 44.1 kHz music preset: f_max=4186 fits below 0.8×(44100/8)/... at d=2
        assert chroma_decimation_depth(44100.0, 4096, 1024, 4186.0) == 2
        # 16 kHz: one halving already puts f_max past the passband edge
        assert chroma_decimation_depth(16000.0, 1024, 256, 4186.0) == 0
        # indivisible hop blocks decimation
        assert chroma_decimation_depth(44100.0, 4096, 1023, 4186.0) == 0

    def test_matches_fullrate_bandlimited(self):
        x = self._music()
        full = sg.ChromaPlan(self.STFT44, self.SR44, dtype="float32")
        multi = sg.ChromaPlan(
            self.STFT44,
            self.SR44,
            sg.ChromaParams.music_standard().with_multirate(),
            dtype="float32",
        )
        assert multi._decimation == 2
        a = np.asarray(full.compute(x).data)
        b = np.asarray(multi.compute(x).data)
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 2e-4 * np.abs(a).max()

    def test_matches_fullrate_broadband_and_unnormed(self):
        # Broadband noise exercises the discarded band (alias + leakage);
        # norm=NONE exercises the 2^d magnitude rescale.
        x = np.random.default_rng(5).standard_normal(44100).astype(np.float32)
        pn = sg.ChromaParams(norm=sg.ChromaNorm.NONE)
        a = np.asarray(
            sg.ChromaPlan(self.STFT44, self.SR44, pn, dtype="float32").compute(x).data
        )
        b = np.asarray(
            sg.ChromaPlan(
                self.STFT44, self.SR44, pn.with_multirate(), dtype="float32"
            ).compute(x).data
        )
        assert np.abs(a - b).max() <= 5e-4 * np.abs(a).max()

    def test_odd_length_and_centre_false(self):
        x = self._music()[:-7]
        for centre in (True, False):
            stft = sg.StftParams(4096, 1024, centre=centre)
            a = np.asarray(
                sg.ChromaPlan(stft, self.SR44, dtype="float32").compute(x).data
            )
            b = np.asarray(
                sg.ChromaPlan(
                    stft,
                    self.SR44,
                    sg.ChromaParams.music_standard().with_multirate(),
                    dtype="float32",
                ).compute(x).data
            )
            assert a.shape == b.shape
            assert np.abs(a - b).max() <= 2e-4 * np.abs(a).max()

    def test_noop_when_rate_too_low(self):
        # 16 kHz speech config: depth 0 — bitwise-identical plan behavior.
        x = np.random.default_rng(6).standard_normal(16000).astype(np.float32)
        full = sg.ChromaPlan(STFT, SR, dtype="float32")
        multi = sg.ChromaPlan(
            STFT, SR, sg.ChromaParams.music_standard().with_multirate(),
            dtype="float32",
        )
        assert multi._decimation == 0
        assert np.array_equal(
            np.asarray(full.compute(x).data), np.asarray(multi.compute(x).data)
        )

    def test_batch_matches_single(self):
        x = self._music(0.5)
        xb = np.stack([x, x[::-1].copy()])
        plan = sg.ChromaPlan(
            self.STFT44,
            self.SR44,
            sg.ChromaParams.music_standard().with_multirate(),
            dtype="float32",
        )
        cb = np.asarray(plan.compute_batch(xb))
        c0 = np.asarray(plan.compute(x).data)
        assert np.abs(cb[0] - c0).max() <= 1e-5 * np.abs(c0).max()

    def test_pallas_multirate_matches_xla(self):
        # Fused-kernel multirate path (interpret mode on CPU).
        x = self._music(0.4)
        mp = sg.ChromaParams.music_standard().with_multirate()
        a = np.asarray(
            sg.ChromaPlan(self.STFT44, self.SR44, mp, dtype="float32")
            .compute(x).data
        )
        b = np.asarray(
            sg.ChromaPlan(
                self.STFT44, self.SR44, mp, dtype="float32", method="pallas"
            ).compute(x).data
        )
        assert np.abs(a - b).max() <= 5e-4 * np.abs(a).max()

    def test_multirate_grad_finite(self):
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(self._music(0.3))
        plan = sg.ChromaPlan(
            self.STFT44,
            self.SR44,
            sg.ChromaParams.music_standard().with_multirate(),
            dtype="float32",
        )
        g = jax.grad(lambda s: jnp.sum(plan._forward(s)))(x)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestFramedDecimator:
    """decimate_pow2_framed == decimate_pow2_strided (the conv cascade)."""

    @pytest.mark.parametrize("d", [1, 2, 3])
    @pytest.mark.parametrize("n", [22050, 22051, 2000])
    def test_matches_strided_cascade(self, d, n):
        from spectrograms_tpu.ops.decimate import (
            decimate_pow2_framed,
            decimate_pow2_strided,
        )

        x = np.random.default_rng(d * 100 + n).standard_normal(n).astype(np.float32)
        # Zero-guarded ends: the composite filter and the cascade agree
        # exactly (the cascade truncates its intermediate only within a
        # filter length of the signal ends).
        x[:600] = 0.0
        x[-600:] = 0.0
        a = np.asarray(decimate_pow2_strided(x, d))
        b = np.asarray(decimate_pow2_framed(x, d))
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 2e-6

    def test_batch_and_hop_variants(self):
        import jax

        from spectrograms_tpu.ops.decimate import (
            decimate_pow2_framed,
            decimate_pow2_strided,
        )

        xb = np.random.default_rng(3).standard_normal((3, 9000)).astype(np.float32)
        xb[:, :600] = 0.0
        xb[:, -600:] = 0.0
        a = np.stack([np.asarray(decimate_pow2_strided(xb[i], 2)) for i in range(3)])
        for hop in (64, 256, 1024):
            b = np.asarray(
                decimate_pow2_framed(
                    xb, 2, precision=jax.lax.Precision.HIGHEST, hop=hop
                )
            )
            assert a.shape == b.shape
            assert np.abs(a - b).max() <= 2e-6
