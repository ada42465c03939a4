"""CLI surface tests mirroring the reference's main.rs contract."""

import numpy as np
import pytest

from crucible_tpu.cli import main
from crucible_tpu.io.image import read_ppm


class TestCli:
    def test_image_render_default_ppm(self, tmp_path, capsys):
        out = tmp_path / "img"
        rc = main(
            ["--file", str(out), "--world", "6", "--spp", "2", "--width", "48", "--cpu"]
        )
        assert rc == 0
        img = read_ppm(f"{out}.ppm")
        assert img.shape == (27, 48, 3)

    def test_invalid_world_warns_and_defaults(self, tmp_path, capsys):
        out = tmp_path / "img"
        rc = main(
            ["--file", str(out), "--world", "99", "--spp", "1", "--width", "32", "--cpu"]
        )
        assert rc == 0
        assert "invalid" in capsys.readouterr().err

    def test_movie_requires_seconds_and_rate(self, tmp_path, capsys):
        rc = main(["--file", str(tmp_path / "m"), "--movie"])
        assert rc == 2
        assert "--seconds" in capsys.readouterr().err

    def test_movie_renders_frames(self, tmp_path):
        out = tmp_path / "mv"
        rc = main(
            [
                "--file", str(out), "--movie", "--world", "1",
                "--seconds", "0.5", "--rate", "4",
                "--spp", "2", "--depth", "2", "--width", "32", "--cpu",
            ]
        )
        assert rc == 0
        frames = sorted((out / "artifacts").glob("image*.ppm"))
        assert len(frames) == 2  # ceil(0.5 * 4)
        a = read_ppm(frames[0]).astype(float)
        b = read_ppm(frames[1]).astype(float)
        assert np.abs(a - b).mean() > 0.5  # the camera walk moved

    def test_movie_on_frame_and_resume(self, tmp_path):
        """on_frame fires per RENDERED frame with positive seconds;
        skip_existing resumes without re-rendering (or re-firing)."""
        from crucible_tpu.models import demo, render

        sc = demo.first_movie(duration=0.5, frame_rate=4)
        sc.scene_cam.image_width = 32
        sc.scene_cam.set_samples(2)
        sc.scene_cam.set_max_depth(2)
        calls = []
        render.render_movie(
            sc, str(tmp_path / "mv2"), skip_existing=True, verbose=False,
            on_frame=lambda i, dt: calls.append((i, dt)),
        )
        assert [i for i, _ in calls] == [0, 1]
        assert all(dt > 0 for _, dt in calls)
        calls2 = []
        render.render_movie(
            sc, str(tmp_path / "mv2"), skip_existing=True, verbose=False,
            on_frame=lambda i, dt: calls2.append(i),
        )
        assert calls2 == []

    def test_threads_flag_accepted(self, tmp_path):
        # Reference parity: --threads exists; ignored here (mesh sharding).
        rc = main(
            ["--file", str(tmp_path / "x"), "--world", "6", "--spp", "1",
             "--width", "16", "--threads", "8", "--cpu"]
        )
        assert rc == 0
