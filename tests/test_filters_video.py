"""Tests for the hex filter bank and the streaming video path."""
import numpy as np
import jax.numpy as jnp

from hygrid_tpu.nn import filters
from hygrid_tpu.nn import functional as F
from hygrid_tpu.models.video import (make_frame_processor, process_stream,
                                     StreamStats)


class TestFilters:
    def test_gaussian_preserves_constant(self):
        x = jnp.full((1, 3, 12, 10), 5.0)
        out = np.asarray(filters.hex_gaussian_blur(x))
        # interior cells (all 7 taps in-range) stay exactly constant
        np.testing.assert_allclose(out[:, :, 2:-2, 2:-2], 5.0, atol=1e-5)

    def test_laplacian_zero_on_constant(self):
        x = jnp.full((1, 1, 12, 10), 3.0)
        out = np.asarray(filters.hex_edge_detect(x))
        np.testing.assert_allclose(out[:, :, 2:-2, 2:-2], 0.0, atol=1e-5)

    def test_laplacian_responds_to_edges(self):
        x = np.zeros((1, 1, 16, 16), np.float32)
        x[:, :, :, 8:] = 1.0
        out = np.asarray(filters.hex_edge_detect(x))
        assert np.abs(out[0, 0, 8, 6:10]).max() > 0.1
        np.testing.assert_allclose(out[0, 0, 8, 2:5], 0.0, atol=1e-5)

    def test_sharpen_identity_plus_edges(self):
        rng = np.random.default_rng(0)
        x = rng.random((1, 2, 12, 12)).astype(np.float32)
        s = np.asarray(filters.hex_filter(x, filters.hex_sharpen_kernel(0.0)))
        np.testing.assert_allclose(s[:, :, 2:-2, 2:-2], x[:, :, 2:-2, 2:-2],
                                   atol=1e-5)

    def test_filter_matches_explicit_conv(self):
        rng = np.random.default_rng(1)
        x = rng.random((2, 3, 10, 11)).astype(np.float32)
        taps = filters.hex_gaussian_kernel(0.8)
        got = np.asarray(filters.hex_filter(x, taps))
        kernel = np.broadcast_to(taps, (3, 1, 7))
        want = np.asarray(F.hex_conv2d(x, kernel, even_odd_offset=0,
                                       radius=2, padding=1, groups=3,
                                       impl="type1"))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bad_tap_count(self):
        import pytest
        with pytest.raises(ValueError):
            filters.hex_filter(np.ones((1, 1, 8, 8)), np.ones(5))


class TestVideo:
    def test_stream_processes_all_frames(self):
        rng = np.random.default_rng(0)
        proc = make_frame_processor(32, 48)
        frames = [rng.random((3, 32, 48)).astype(np.float32)
                  for _ in range(5)]
        stats = StreamStats()
        outs = list(process_stream(iter(frames), proc, stats))
        assert len(outs) == 5
        assert stats.frames == 5
        assert all(o.shape == (3, 16, 24) for o in outs)

    def test_processor_with_post(self):
        proc = make_frame_processor(
            32, 32, post=lambda h: jnp.mean(h, axis=(2, 3)))
        out = proc(jnp.ones((3, 32, 32)))
        assert out.shape == (3,)


class TestVideoMicrobatch:
    def test_microbatch_stream(self):
        import numpy as np
        from hygrid_tpu.models.video import make_batch_processor
        rng = np.random.default_rng(1)
        proc = make_batch_processor(16, 16)
        frames = [rng.random((3, 16, 16)).astype(np.float32)
                  for _ in range(7)]
        stats = StreamStats()
        outs = list(process_stream(iter(frames), proc, stats, microbatch=3))
        assert len(outs) == 7
        assert stats.frames == 7
        # microbatched results equal per-frame results
        single = make_frame_processor(16, 16)
        np.testing.assert_allclose(np.asarray(outs[0]),
                                   np.asarray(single(frames[0])), atol=1e-5)
