"""AOT export / deserialize tests (dvsg_tpu/export.py).

The artifact must reproduce the live pipeline bit-for-bit: the exported
program IS ``stabilize_chunk_impl`` closed over (cfg, params), so the
loaded callable's output equals ``Stabilizer.stabilize_clip`` exactly.
"""

import os

import numpy as np
import jax
import pytest

from dvsg_tpu import export as export_lib
from dvsg_tpu.config import ModelConfig, StabilizeConfig
from dvsg_tpu.models import motion_cnn
from dvsg_tpu.pipeline.stabilize import Stabilizer, initial_halo
from dvsg_tpu.train import synthetic


@pytest.fixture(scope="module")
def small_setup():
    mcfg = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                       base_features=8, levels=2, blocks_per_level=1)
    cfg = StabilizeConfig(model=mcfg, chunk_frames=4, warp_impl="lax")
    params = motion_cnn.init_params(mcfg, jax.random.key(1))
    frames, _, _ = synthetic.synthetic_clip_u8(jax.random.key(2), 10, 48, 64)
    return cfg, params, np.asarray(frames)


class TestExportRoundtrip:
    def test_artifact_matches_live_pipeline(self, tmp_path, small_setup):
        cfg, params, frames = small_setup
        path = str(tmp_path / "model.dvsgx")
        exp = export_lib.export_chunk_program(cfg, params, 48, 64)
        export_lib.save_exported(exp, path, cfg)

        loaded = export_lib.load_exported(path)
        assert loaded.chunk_frames == 4
        assert (loaded.height, loaded.width) == (48, 64)
        out = loaded.stabilize_clip(frames)

        ref = Stabilizer(cfg, params).stabilize_clip(frames)
        np.testing.assert_array_equal(out, np.asarray(ref))
        assert out.dtype == np.uint8

    def test_chunk_call_matches_impl(self, tmp_path, small_setup):
        cfg, params, frames = small_setup
        from dvsg_tpu.pipeline.stabilize import stabilize_chunk_impl
        path = str(tmp_path / "m.dvsgx")
        export_lib.save_exported(
            export_lib.export_chunk_program(cfg, params, 48, 64), path, cfg)
        loaded = export_lib.load_exported(path)
        halo = initial_halo(cfg, frames[0])
        out, new_halo, offs = loaded.chunk(frames[:4], halo)
        ref_out, ref_halo, ref_offs = stabilize_chunk_impl(
            cfg, params, frames[:4], halo)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
        np.testing.assert_array_equal(np.asarray(new_halo),
                                      np.asarray(ref_halo))
        np.testing.assert_allclose(np.asarray(offs), np.asarray(ref_offs))

    def test_header_metadata(self, tmp_path, small_setup):
        cfg, params, _ = small_setup
        path = str(tmp_path / "m.dvsgx")
        export_lib.save_exported(
            export_lib.export_chunk_program(cfg, params, 48, 64), path, cfg,
            extra={"checkpoint": "unit-test"})
        loaded = export_lib.load_exported(path)
        assert loaded.meta["format"] == "dvsgx"
        assert loaded.meta["checkpoint"] == "unit-test"
        assert loaded.cfg.chunk_frames == cfg.chunk_frames
        assert loaded.cfg.model.window == cfg.model.window
        assert loaded.meta["platforms"] == ["cpu"]

    def test_wrong_resolution_rejected(self, tmp_path, small_setup):
        cfg, params, _ = small_setup
        path = str(tmp_path / "m.dvsgx")
        export_lib.save_exported(
            export_lib.export_chunk_program(cfg, params, 48, 64), path, cfg)
        loaded = export_lib.load_exported(path)
        bad = np.zeros((4, 32, 32, 3), np.uint8)
        with pytest.raises(ValueError, match="exported for frames"):
            loaded.stabilize_clip(bad)

    def test_bad_magic_rejected(self, tmp_path):
        path = str(tmp_path / "junk.dvsgx")
        with open(path, "wb") as f:
            f.write(b"not an artifact")
        with pytest.raises(ValueError, match="not a dvsgx artifact"):
            export_lib.load_exported(path)

    def test_truncated_artifact_rejected(self, tmp_path, small_setup):
        """Truncation at each layout boundary must give the actionable
        message, not a struct/json/deserialize traceback."""
        import json
        import struct
        cfg, params, _ = small_setup
        good = str(tmp_path / "good.dvsgx")
        export_lib.save_exported(
            export_lib.export_chunk_program(cfg, params, 48, 64), good,
            cfg)
        blob = open(good, "rb").read()
        hdr_end = (len(export_lib._MAGIC) + 4 + struct.unpack(
            "<I", blob[len(export_lib._MAGIC):len(export_lib._MAGIC) + 4]
        )[0])
        for cut, what in ((len(export_lib._MAGIC) + 2, "header length"),
                          (hdr_end - 5, "header cut short"),
                          (hdr_end, "no program bytes")):
            path = str(tmp_path / f"cut{cut}.dvsgx")
            with open(path, "wb") as f:
                f.write(blob[:cut])
            with pytest.raises(ValueError, match="truncated artifact"):
                export_lib.load_exported(path)

    def test_future_format_version_rejected(self, tmp_path):
        import json
        import struct
        hdr = json.dumps({"format": "dvsgx", "version": 99}).encode()
        path = str(tmp_path / "future.dvsgx")
        with open(path, "wb") as f:
            f.write(export_lib._MAGIC)
            f.write(struct.pack("<I", len(hdr)))
            f.write(hdr)
            f.write(b"x")
        with pytest.raises(ValueError, match="unsupported artifact "
                                             "format"):
            export_lib.load_exported(path)


class TestExportCLI:
    def test_cli_export_then_load(self, tmp_path):
        from dvsg_tpu import cli
        path = str(tmp_path / "fast.dvsgx")
        rc = cli.export_main([
            "--output", path, "--size", "48", "64",
            "--chunk-frames", "4", "--warp-impl", "lax",
            "--platform", "cpu",
            "--window", "3", "--model-size", "32", "32",
            "--grid-size", "8", "8",
        ])
        assert rc == 0
        assert os.path.getsize(path) > 0
        loaded = export_lib.load_exported(path)
        frames = np.zeros((4, 48, 64, 3), np.uint8)
        out = loaded.stabilize_clip(frames)
        assert out.shape == frames.shape


class TestCrossExport:
    def test_tpu_artifact_from_cpu_host(self, tmp_path, small_setup):
        """Cross-lowering for a TPU fleet from a CPU build host: the
        Pallas warp kernel must serialize (tpu_custom_call) without TPU
        hardware present. Execution parity is validated on-chip by
        scripts/validate_export_tpu.py (can't run in the hermetic CPU
        suite)."""
        cfg, params, _ = small_setup
        cfg = cfg.replace(warp_impl="pallas")
        path = str(tmp_path / "tpu.dvsgx")
        exp = export_lib.export_chunk_program(cfg, params, 48, 64,
                                              platforms=("tpu",))
        export_lib.save_exported(exp, path, cfg)
        loaded = export_lib.load_exported(path)
        assert loaded.meta["platforms"] == ["tpu"]
        assert loaded.cfg.warp_impl == "pallas"
        # the serialized program embeds the Mosaic kernel custom call
        with open(path, "rb") as f:
            blob = f.read()
        assert b"tpu_custom_call" in blob

    def test_auto_impl_resolves_against_target_platform(self, tmp_path,
                                                        small_setup):
        """warp_impl='auto' with platforms=('tpu',) on a CPU build host
        must bake the Pallas kernel, not the lax oracle the host backend
        would resolve to (resolve_cfg_platforms): the DEPLOY.md cross-
        export command says 'CPU is fine' and previously shipped a
        silently ~100x-slower artifact."""
        cfg, params, _ = small_setup
        cfg = cfg.replace(warp_impl="auto")
        assert export_lib.resolve_cfg_platforms(
            cfg, ("tpu",)).warp_impl == "pallas"
        assert export_lib.resolve_cfg_platforms(
            cfg, ("cpu",)).warp_impl == "lax"
        # No target platforms: leave "auto" to resolve at trace time.
        assert export_lib.resolve_cfg_platforms(
            cfg, None).warp_impl == "auto"

        path = str(tmp_path / "auto_tpu.dvsgx")
        exp = export_lib.export_chunk_program(cfg, params, 48, 64,
                                              platforms=("tpu",))
        export_lib.save_exported(
            exp, path, export_lib.resolve_cfg_platforms(cfg, ("tpu",)))
        loaded_meta = export_lib.load_exported(path)
        assert loaded_meta.cfg.warp_impl == "pallas"
        with open(path, "rb") as f:
            assert b"tpu_custom_call" in f.read()


class TestBatchExport:
    def test_sharded_batch_artifact_matches_dp(self, tmp_path, small_setup):
        """The mesh-sharded multi-clip program (config 4/5) exports and
        reproduces ShardedClipStabilizer exactly on the virtual 8-device
        mesh."""
        from dvsg_tpu.parallel import mesh as mesh_lib
        from dvsg_tpu.parallel.dp import ShardedClipStabilizer

        cfg, params, _ = small_setup
        mesh = mesh_lib.make_mesh()
        n_dev = mesh.devices.size
        assert n_dev == 8  # conftest virtual mesh
        clips = np.stack([
            np.asarray(synthetic.synthetic_clip_u8(
                jax.random.key(10 + i), 6, 48, 64)[0])
            for i in range(n_dev)])

        path = str(tmp_path / "batch.dvsgx")
        exp = export_lib.export_batch_program(cfg, params, n_dev, 48, 64,
                                              mesh)
        export_lib.save_exported(exp, path, cfg)
        loaded = export_lib.load_exported(path)
        assert loaded.batched and loaded.n_clips == n_dev
        assert loaded.meta["nr_devices"] == n_dev

        out = loaded.stabilize_clips(clips)
        ref = ShardedClipStabilizer(cfg, params, mesh).stabilize_clips(
            clips)
        np.testing.assert_array_equal(out, np.asarray(ref))

    def test_batch_artifact_rejects_single_clip_api(self, tmp_path,
                                                    small_setup):
        from dvsg_tpu.parallel import mesh as mesh_lib
        cfg, params, _ = small_setup
        mesh = mesh_lib.make_mesh()
        path = str(tmp_path / "b.dvsgx")
        export_lib.save_exported(
            export_lib.export_batch_program(cfg, params, 8, 48, 64, mesh),
            path, cfg)
        loaded = export_lib.load_exported(path)
        with pytest.raises(ValueError, match="batched artifact"):
            loaded.stabilize_clip(np.zeros((4, 48, 64, 3), np.uint8))
        with pytest.raises(ValueError, match="exported for 8 clips"):
            loaded.stabilize_clips(np.zeros((4, 6, 48, 64, 3), np.uint8))

    def test_batch_artifact_with_production_kernel_interpret(
            self, tmp_path, small_setup):
        """The deployed-program-is-the-tested-one rule (VERDICT r2 item
        2) extended to the export path: the sharded artifact built with
        the PRODUCTION Pallas program (interpret mode on CPU) must match
        the lax-path artifact exactly after the u8 quantize (<=1 LSB is
        the kernel contract; on these smooth grids interpret==lax
        bit-for-bit through the quantize)."""
        from dvsg_tpu.parallel import mesh as mesh_lib

        cfg, params, _ = small_setup
        mesh = mesh_lib.make_mesh()
        clips = np.stack([
            np.asarray(synthetic.synthetic_clip_u8(
                jax.random.key(20 + i), 6, 48, 64)[0])
            for i in range(mesh.devices.size)])

        outs = {}
        for impl in ("lax", "pallas_interpret"):
            path = str(tmp_path / f"{impl}.dvsgx")
            export_lib.save_exported(
                export_lib.export_batch_program(
                    cfg.replace(warp_impl=impl), params,
                    clips.shape[0], 48, 64, mesh),
                path, cfg.replace(warp_impl=impl))
            outs[impl] = export_lib.load_exported(path).stabilize_clips(
                clips)
        diff = np.max(np.abs(outs["lax"].astype(int)
                             - outs["pallas_interpret"].astype(int)))
        assert diff <= 1, f"kernel-vs-lax artifact diff {diff} LSB"


class TestSmoothedExport:
    """Path smoothing in the artifact (VERDICT round-4 item 2): the
    (4,) EMA state is a state-in → state-out slot of the exported
    signature, and every loaded consumption path threads it — byte-
    identical to the live smoothed pipeline."""

    @pytest.fixture(scope="class")
    def smooth_setup(self):
        mcfg = ModelConfig(window=3, model_size=(32, 32), grid_size=(8, 8),
                           base_features=8, levels=2, blocks_per_level=1)
        cfg = StabilizeConfig(model=mcfg, chunk_frames=4, warp_impl="lax",
                              path_smooth=8)
        params = motion_cnn.init_params(mcfg, jax.random.key(1))
        frames, _, _ = synthetic.synthetic_clip_u8(jax.random.key(2), 10,
                                                   48, 64)
        return cfg, params, np.asarray(frames)

    def test_smoothed_artifact_matches_live(self, tmp_path, smooth_setup):
        cfg, params, frames = smooth_setup
        path = str(tmp_path / "s.dvsgx")
        exp = export_lib.export_chunk_program(cfg, params, 48, 64)
        export_lib.save_exported(exp, path, cfg)
        loaded = export_lib.load_exported(path)
        assert loaded.smooth
        assert len(loaded.meta["in_avals"]) == 3      # state slot baked
        assert loaded.meta["in_avals"][2][0] == [4]
        out = loaded.stabilize_clip(frames)
        ref = Stabilizer(cfg, params).stabilize_clip(frames)
        np.testing.assert_array_equal(out, np.asarray(ref))

    def test_smoothed_engine_streaming_matches(self, tmp_path,
                                               smooth_setup):
        """The artifact engine rides the full streaming driver with the
        state threaded (resume machinery included)."""
        cfg, params, frames = smooth_setup
        path = str(tmp_path / "s.dvsgx")
        export_lib.save_exported(
            export_lib.export_chunk_program(cfg, params, 48, 64), path,
            cfg)
        stab = export_lib.load_exported(path).engine()

        class _R:
            i = 0

            def read_batch(self, k):
                c = frames[self.i:self.i + k]
                self.i += c.shape[0]
                return c

        class _W:
            chunks = []

            def write_batch(self, x):
                self.chunks.append(np.array(x))

        w = _W()
        n = stab.stabilize_stream(_R(), w)
        assert n == frames.shape[0]
        ref = Stabilizer(cfg, params).stabilize_clip(frames)
        np.testing.assert_array_equal(np.concatenate(w.chunks),
                                      np.asarray(ref))

    def test_chunk_without_state_raises(self, tmp_path, smooth_setup):
        cfg, params, frames = smooth_setup
        path = str(tmp_path / "s.dvsgx")
        export_lib.save_exported(
            export_lib.export_chunk_program(cfg, params, 48, 64), path,
            cfg)
        loaded = export_lib.load_exported(path)
        halo = initial_halo(cfg, frames[0])
        with pytest.raises(ValueError, match="smooth_state"):
            loaded.chunk(frames[:4], halo)

    def test_smoothed_batch_artifact_matches_dp(self, tmp_path,
                                                smooth_setup):
        from dvsg_tpu.parallel import mesh as mesh_lib
        from dvsg_tpu.parallel.dp import ShardedClipStabilizer

        cfg, params, _ = smooth_setup
        mesh = mesh_lib.make_mesh()
        n_dev = mesh.devices.size
        clips = np.stack([
            np.asarray(synthetic.synthetic_clip_u8(
                jax.random.key(30 + i), 6, 48, 64)[0])
            for i in range(n_dev)])
        path = str(tmp_path / "sb.dvsgx")
        exp = export_lib.export_batch_program(cfg, params, n_dev, 48, 64,
                                              mesh)
        export_lib.save_exported(exp, path, cfg)
        loaded = export_lib.load_exported(path)
        assert loaded.batched and loaded.smooth
        out = loaded.stabilize_clips(clips)
        ref = ShardedClipStabilizer(cfg, params, mesh).stabilize_clips(
            clips)
        np.testing.assert_array_equal(out, np.asarray(ref))


class TestArtifactCLI:
    """`dvsg-stabilize --artifact model.dvsgx`: the artifact rides the
    full streaming driver (engine() subclass) and matches the
    checkpoint-driven run byte-for-byte."""

    @pytest.fixture()
    def clip_dir(self, tmp_path):
        from dvsg_tpu.utils import video_io
        frames, _, _ = synthetic.synthetic_clip_u8(
            jax.random.key(9), 10, 48, 64)
        src = str(tmp_path / "in")
        with video_io.VideoWriter(src, 64, 48) as w:
            w.write_batch(np.asarray(frames))
        return src

    def _export(self, tmp_path):
        from dvsg_tpu import cli
        path = str(tmp_path / "m.dvsgx")
        rc = cli.export_main([
            "--output", path, "--size", "48", "64",
            "--chunk-frames", "4", "--warp-impl", "lax",
            "--platform", "cpu",
            "--window", "3", "--model-size", "32", "32",
            "--grid-size", "8", "8",
        ])
        assert rc == 0
        return path

    def test_artifact_stream_matches_checkpoint_free_run(self, tmp_path,
                                                         clip_dir):
        from dvsg_tpu import cli
        from dvsg_tpu.utils import video_io
        art = self._export(tmp_path)
        d_art = str(tmp_path / "out_art")
        rc = cli.stabilize_main([
            "--input", clip_dir, "--output", d_art,
            "--artifact", art, "--platform", "cpu",
        ])
        assert rc == 0
        # identical untrained arch, same seed -> same output as the
        # config-flag path
        d_ckpt = str(tmp_path / "out_ckpt")
        rc = cli.stabilize_main([
            "--input", clip_dir, "--output", d_ckpt,
            "--window", "3", "--model-size", "32", "32",
            "--grid-size", "8", "8", "--chunk-frames", "4",
            "--warp-impl", "lax", "--platform", "cpu",
        ])
        assert rc == 0
        with video_io.VideoReader(d_art) as r:
            a = r.read_batch(32)
        with video_io.VideoReader(d_ckpt) as r:
            b = r.read_batch(32)
        np.testing.assert_array_equal(a, b)

    def test_artifact_resolution_mismatch_rejected(self, tmp_path,
                                                   clip_dir, capsys):
        from dvsg_tpu import cli
        from dvsg_tpu.utils import video_io
        frames = np.zeros((4, 32, 32, 3), np.uint8)
        small = str(tmp_path / "small_in")
        with video_io.VideoWriter(small, 32, 32) as w:
            w.write_batch(frames)
        art = self._export(tmp_path)
        rc = cli.stabilize_main([
            "--input", small, "--output", str(tmp_path / "o"),
            "--artifact", art, "--platform", "cpu",
        ])
        assert rc == 2
        assert "exported for 64x48" in capsys.readouterr().err

    def test_artifact_conflicts_with_preset(self, tmp_path, clip_dir,
                                            capsys):
        from dvsg_tpu import cli
        rc = cli.stabilize_main([
            "--input", clip_dir, "--output", str(tmp_path / "o"),
            "--artifact", "x.dvsgx", "--preset", "fast",
        ])
        assert rc == 2
        assert "already contains the weights" in capsys.readouterr().err

    @pytest.mark.parametrize("flag", [("--strength", "0.5"),
                                      ("--chunk-frames", "4"),
                                      ("--warp-impl", "lax")])
    def test_artifact_rejects_baked_flags(self, tmp_path, clip_dir, capsys,
                                          flag):
        """--strength/--chunk-frames/--warp-impl are baked into an
        exported program: passing them with --artifact must ERROR, not be
        silently ignored (the output would differ from what was asked)."""
        from dvsg_tpu import cli
        rc = cli.stabilize_main([
            "--input", clip_dir, "--output", str(tmp_path / "o"),
            "--artifact", "x.dvsgx", *flag,
        ])
        assert rc == 2
        assert "baked into the artifact" in capsys.readouterr().err
