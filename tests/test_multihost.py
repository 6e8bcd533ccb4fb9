"""Real multi-process distributed layer: 2 jax.distributed processes on a
localhost coordinator exercise init_multihost, chromosome-shard ownership,
the cross-host WGS median collective from PER-HOST-DISTINCT data, a sharded
DP step over the GLOBAL mesh, and the REAL vc-large-indel driver across the
process group — whose rank-0-merged VCF must be byte-identical to a
single-process run (tools/multihost.py), the executable form of the
reference's 'submit 22 SLURM jobs' story (README.md:244-255)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_group(tmp_path):
    out = str(tmp_path / "MULTIHOST.json")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)      # workers set their own env
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost.py"),
         "--out", out],
        capture_output=True, text=True, timeout=1100, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    assert res["ok"] is True
    # the 2-process vc-large-indel run (different chromosomes per host,
    # query-sharded alignment, rank-0 merge) equals single-process bytes
    assert res["pipeline_vcf_identical"] is True
    assert res["small_vcf_identical"] is True
    assert res["complex_vcf_identical"] is True
    assert res["pipeline_vcf_records"] > 0
    assert {row["pid"] for row in res["rows"]} == {0, 1}
    for row in res["rows"]:
        assert row["devices"] == 8          # global device view on each host
        assert row["median_ok"]
    owned = sorted(c for row in res["rows"] for c in row["own_chroms"])
    assert owned == sorted(f"chr{i}" for i in range(1, 23))
