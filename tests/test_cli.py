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

    def test_make_mp4_argv(self, tmp_path, monkeypatch):
        """make_mp4 shells out with the exact ffmpeg argv mirroring the
        reference's movie_maker.rs:11-30 (pattern, framerate, even-scale
        filter, libx264, yuv420p, crf 25). ffmpeg is absent from CI images,
        so a recording stub on PATH captures the argv (VERDICT r4 #8)."""
        import json
        import os
        import stat

        from crucible_tpu.models.render import make_mp4

        bindir = tmp_path / "bin"
        bindir.mkdir()
        rec = tmp_path / "argv.json"
        stub = bindir / "ffmpeg"
        stub.write_text(
            "#!/bin/sh\n"
            'python3 -c "import json,sys; '
            "json.dump(sys.argv[1:], open('%s','w'))\" \"$@\"\n" % rec
        )
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")

        artifacts = tmp_path / "mv" / "artifacts"
        artifacts.mkdir(parents=True)
        out = tmp_path / "mv" / "mv.mp4"
        ret = make_mp4(artifacts, out, fps=24, pad=3)
        assert ret == out
        argv = json.loads(rec.read_text())
        assert argv == [
            "-y",
            "-framerate", "24",
            "-i", str(artifacts / "image%03d.ppm"),
            "-vf", "scale=trunc(iw/2)*2:trunc(ih/2)*2",
            "-c:v", "libx264",
            "-pix_fmt", "yuv420p",
            "-crf", "25",
            str(out),
        ]

    def test_render_movie_invokes_ffmpeg_stub(self, tmp_path, monkeypatch):
        """End-to-end: render_movie ends by invoking ffmpeg with the frame
        pattern matching the frames it just wrote."""
        import os
        import stat

        from crucible_tpu.models import demo, render

        bindir = tmp_path / "bin"
        bindir.mkdir()
        rec = tmp_path / "argv.txt"
        stub = bindir / "ffmpeg"
        stub.write_text(f"#!/bin/sh\nprintf '%s\\n' \"$@\" > {rec}\n")
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")

        sc = demo.first_movie(duration=0.5, frame_rate=4)
        sc.scene_cam.image_width = 16
        sc.scene_cam.set_samples(1)
        sc.scene_cam.set_max_depth(2)
        out = render.render_movie(sc, str(tmp_path / "mv3"), verbose=False)
        assert out == tmp_path / "mv3" / "mv3.mp4"
        argv = rec.read_text().splitlines()
        pattern = argv[argv.index("-i") + 1]
        import glob

        frames = sorted(glob.glob(str(tmp_path / "mv3" / "artifacts" / "image*.ppm")))
        assert len(frames) == 2
        # The ffmpeg input pattern expands to exactly the written frames.
        assert [pattern % i for i in range(2)] == frames

    def test_threads_flag_accepted(self, tmp_path):
        # Reference parity: --threads exists; ignored here (mesh sharding).
        rc = main(
            ["--file", str(tmp_path / "x"), "--world", "6", "--spp", "1",
             "--width", "16", "--threads", "8", "--cpu"]
        )
        assert rc == 0
