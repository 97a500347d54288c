"""tools/ CLI regressions (bench_diff flag parsing, ADVICE r03)."""

from __future__ import annotations

import json
import sys


def test_bench_diff_band_flag_parsing(tmp_path, monkeypatch, capsys):
    from tools import bench_diff

    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"queries": {"q1": 1.0, "q2": 2.0}}))
    b.write_text(json.dumps({"queries": {"q1": 1.0, "q2": 2.1}}))

    # trailing bare --band: usage message, not IndexError
    monkeypatch.setattr(sys, "argv", ["bench_diff", str(a), str(b), "--band"])
    assert bench_diff.main() == 2

    # --bandwidth is NOT the --band flag; as a third positional it
    # must trip the usage path rather than be consumed as band
    monkeypatch.setattr(
        sys, "argv", ["bench_diff", str(a), str(b), "--bandwidth", "0.5"]
    )
    assert bench_diff.main() == 2

    # both accepted spellings still work
    for extra in (["--band", "0.5"], ["--band=0.5"]):
        monkeypatch.setattr(sys, "argv", ["bench_diff", str(a), str(b)] + extra)
        assert bench_diff.main() == 0
        assert "1.03x" in capsys.readouterr().out

    # empty / non-numeric band value: usage path, not a ValueError
    # traceback (review r04)
    for extra in (["--band="], ["--band", "abc"], ["--band=abc"]):
        monkeypatch.setattr(sys, "argv", ["bench_diff", str(a), str(b)] + extra)
        assert bench_diff.main() == 2
