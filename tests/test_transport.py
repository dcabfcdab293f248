"""Gap-only PCM16 serving transport: exactness vs the full-clip fetch.

Pins the wire contract of ``runtime/transport.py``: the client-side
composite of the (patch, start) payload equals a full-clip
``to_pcm16(restored)`` fetch int16-for-int16, under every phase regime and
for both model families (the compositing contract of SURVEY.md §2.7 /
reference ``models/CNNBLSTM/model.py:107`` is what makes the non-patch
bytes redundant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_audio_inpainting_tpu.ops import gaps as gap_ops
from ml_audio_inpainting_tpu.ops.pcm import to_pcm16
from ml_audio_inpainting_tpu.runtime.inference import (
    make_cnn_inpaint_fn,
    make_gan_inpaint_fn,
)
from ml_audio_inpainting_tpu.runtime.transport import (
    composite_gap_patch,
    make_gap_transport_fn,
)
from ml_audio_inpainting_tpu.train.cnn_trainer import build_model, create_cnn_state
from ml_audio_inpainting_tpu.train.gan_trainer import build_generator

from test_inference import tiny_cfg

WINDOW = 2048


def _full_fetch_reference(inpaint_fn, variables, audio, gap_start, gap_len):
    """The full-clip deliverable the transport must reproduce: the restored
    waveform under the (idempotent) device-side composite, PCM16-quantized."""
    restored, _ = inpaint_fn(variables, audio, gap_start, gap_len)
    n = audio.shape[-1]
    tmask = jax.vmap(
        lambda s, l: gap_ops.gap_mask(n, s, l, dtype=audio.dtype)
    )(gap_start, gap_len)
    return np.asarray(to_pcm16(audio * tmask + restored * (1.0 - tmask)))


class TestGapTransport:
    def _gan(self, **kw):
        cfg = tiny_cfg(gan=True)
        gen = build_generator(cfg)
        F = cfg.data.spectrogram.freq_bins
        T = cfg.data.spectrogram.frames(cfg.data.max_samples)
        variables = gen.init(
            jax.random.PRNGKey(0), jnp.zeros((1, F, T)), jnp.ones((1, F, T)),
            train=False,
        )
        return make_gan_inpaint_fn(cfg, gen, **kw), variables

    @pytest.mark.parametrize(
        "mode,phase",
        [("enhanced", "oracle"), ("enhanced", "extrapolate"), ("parity", "oracle")],
    )
    def test_gan_exact_vs_full_fetch(self, speech_like, mode, phase):
        fn, variables = self._gan(mode=mode, phase=phase)
        audio = jnp.asarray(
            np.stack([speech_like[:16000], speech_like[1000:17000]])
        )
        gs = jnp.asarray([4000, 9000])
        gl = jnp.asarray([1280, 640])
        tfn = make_gap_transport_fn(fn, window=WINDOW)
        patch, start = tfn(variables, audio, gs, gl)
        assert np.asarray(patch).dtype == np.int16
        assert patch.shape == (2, WINDOW)
        client = composite_gap_patch(
            np.asarray(to_pcm16(audio)), patch, start
        )
        full = _full_fetch_reference(fn, variables, audio, gs, gl)
        np.testing.assert_array_equal(client, full)

    def test_patch_contains_gap_at_clip_end(self, speech_like):
        """start clips so the window stays in-bounds AND still covers a gap
        butting against the clip end."""
        fn, variables = self._gan(mode="enhanced")
        audio = jnp.asarray(speech_like[:16000])[None, :]
        gs = jnp.asarray([16000 - 1300])  # gap ends 20 samples before EOF
        gl = jnp.asarray([1280])
        tfn = make_gap_transport_fn(fn, window=WINDOW)
        patch, start = tfn(variables, audio, gs, gl)
        s = int(np.asarray(start)[0])
        assert s + WINDOW <= 16000
        assert s <= 16000 - 1300 and s + WINDOW >= 16000 - 1300 + 1280
        client = composite_gap_patch(np.asarray(to_pcm16(audio)), patch, start)
        np.testing.assert_array_equal(
            client, _full_fetch_reference(fn, variables, audio, gs, gl)
        )

    def test_payload_is_small(self):
        """The wire win the transport exists for: patch bytes ~2.6% of the
        full-clip PCM16 payload at the 5 s / 80 ms serving condition."""
        full_bytes = 80000 * 2
        patch_bytes = WINDOW * 2 + 4
        assert patch_bytes / full_bytes < 0.055

    def test_cnn_exact_vs_full_fetch(self, speech_like):
        cfg = tiny_cfg(gan=False)
        model = build_model(cfg)
        state = create_cnn_state(cfg, jax.random.PRNGKey(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fn = make_cnn_inpaint_fn(cfg, model, phase="extrapolate")
        audio = jnp.asarray(speech_like[:16000])[None, :]
        gs, gl = jnp.asarray([7000]), jnp.asarray([1280])
        tfn = make_gap_transport_fn(fn, window=WINDOW)
        patch, start = tfn(variables, audio, gs, gl)
        client = composite_gap_patch(np.asarray(to_pcm16(audio)), patch, start)
        np.testing.assert_array_equal(
            client, _full_fetch_reference(fn, variables, audio, gs, gl)
        )

    def test_sharded_gap_transport_matches_single_device(self, speech_like):
        """The gap transport composes with DP serving: sharding the batch
        over the mesh yields byte-identical patches/starts (int16/int32 --
        exact equality, no tolerance)."""
        from ml_audio_inpainting_tpu.parallel.mesh import make_mesh
        from ml_audio_inpainting_tpu.runtime.inference import (
            make_sharded_serving_fn,
        )

        fn, variables = self._gan(mode="enhanced")
        tfn = make_gap_transport_fn(fn, window=WINDOW)
        B, S = 8, 16000
        audio = jnp.asarray(
            np.stack([speech_like[i * 500 : i * 500 + S] for i in range(B)])
        )
        gs = jnp.asarray(np.linspace(2000, 10000, B).astype(np.int32))
        gl = jnp.full((B,), 1280, jnp.int32)
        patch1, start1 = tfn(variables, audio, gs, gl)
        sharded = make_sharded_serving_fn(tfn, make_mesh())
        patch8, start8 = sharded(variables, audio, gs, gl)
        np.testing.assert_array_equal(np.asarray(patch8), np.asarray(patch1))
        np.testing.assert_array_equal(np.asarray(start8), np.asarray(start1))

    def test_window_exceeding_clip_raises(self, speech_like):
        fn, variables = self._gan(mode="enhanced")
        audio = jnp.asarray(speech_like[:16000])[None, :]
        tfn = make_gap_transport_fn(fn, window=32000)
        with pytest.raises(ValueError, match="exceeds clip length"):
            tfn(variables, audio, jnp.asarray([4000]), jnp.asarray([1280]))
