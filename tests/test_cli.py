"""CLI round-trip tests: generate -> detect -> verify -> bench."""

import json

import pytest

from radar_tpu import cli


@pytest.fixture(scope="module")
def cap_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "cap.bin"
    rc = cli.main(
        ["generate", str(path), "--frames", "6", "--target", "4.0,1.5,10",
         "--seed", "3"]
    )
    assert rc == 0
    return path


def test_generate_creates_valid_capture(cap_path, cfg):
    from radar_tpu.io.capture import frames_in_file

    assert frames_in_file(cap_path, cfg) == 6


def test_detect_writes_jsonl(cap_path, tmp_path):
    out = tmp_path / "dets.jsonl"
    rc = cli.main(["detect", str(cap_path), "--out", str(out), "--full"])
    assert rc == 0
    lines = [json.loads(x) for x in out.read_text().splitlines()]
    assert len(lines) == 5
    assert lines[0]["frame"] == 1
    assert "distance_m" in lines[0]
    assert isinstance(lines[0]["detections"], list)
    # the 4 m target should appear among the CFAR detections
    assert any(
        abs(d["range_m"] - 4.0) < 1.0
        for rec in lines for d in rec["detections"]
    )


def test_verify_passes(cap_path, capsys):
    rc = cli.main(["verify", str(cap_path)])
    assert rc == 0
    assert "5 ok, 0 failed" in capsys.readouterr().out


def test_bench_tpu_mode(cap_path, capsys):
    rc = cli.main(["bench", str(cap_path), "--batch", "4"])
    assert rc == 0
    assert "FPS" in capsys.readouterr().out


def test_bench_native_mode(cap_path, capsys):
    rc = cli.main(["bench", str(cap_path), "--native"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "native golden model" in out
    assert "Total FFT time" in out


def test_bench_stages_mode(cap_path, capsys):
    rc = cli.main(["bench", str(cap_path), "--batch", "4", "--stages"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Total FFT time" in out
    assert "Reshape + Extension" in out
    assert "findMax" in out


def test_bench_profile_export(cap_path, tmp_path, capsys):
    prof = tmp_path / "trace"
    rc = cli.main(["bench", str(cap_path), "--batch", "4",
                   "--profile", str(prof)])
    assert rc == 0
    assert prof.exists() and any(prof.rglob("*"))


def test_detect_resume(cap_path, tmp_path):
    out = tmp_path / "resume.jsonl"
    # first pass: write everything, then truncate to 2 records
    rc = cli.main(["detect", str(cap_path), "--out", str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    full = list(lines)
    out.write_text("\n".join(lines[:2]) + "\n")
    # resume appends frames 3..5 only
    rc = cli.main(["detect", str(cap_path), "--out", str(out), "--resume"])
    assert rc == 0
    resumed = out.read_text().splitlines()
    assert len(resumed) == len(full)
    assert [json.loads(x)["frame"] for x in resumed] == [1, 2, 3, 4, 5]
    # resuming again is a no-op
    rc = cli.main(["detect", str(cap_path), "--out", str(out), "--resume"])
    assert rc == 0
    assert out.read_text().splitlines() == resumed


def test_track_command(cap_path, capsys):
    rc = cli.main(["track", str(cap_path)])
    assert rc == 0
    out = capsys.readouterr().out
    recs = [json.loads(x) for x in out.splitlines() if x and not x.startswith("#")]
    assert recs
    assert any(abs(r["range_m"] - 4.0) < 1.0 for r in recs)
