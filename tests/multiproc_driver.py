"""SPMD driver for the true multi-process (multi-host-style) test.

Launched N times by tests/test_multiprocess.py with a shared coordinator
port. Each process owns 4 virtual CPU devices; jax.distributed stitches
them into one global mesh — the same multi-controller topology as a real
multi-host TPU pod (parallel/multihost.py), with Gloo standing in for
DCN. Every process runs the identical query sequence (SPMD: collectives
must be entered in lockstep) and asserts parity against a local
single-device context.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("DFTPU_FORCE_CPU", "1")

import jax

jax.config.update("jax_platforms", "cpu")

from datafusion_tpu.parallel.multihost import initialize_multihost

initialize_multihost(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
assert jax.device_count() == 4 * nproc
assert jax.process_count() == nproc

import numpy as np

import datafusion_tpu as df
from datafusion_tpu.parallel.mesh import make_mesh

rows = 8192
rng = np.random.default_rng(7)  # identical data on every process
data = {
    "k": rng.integers(0, 40, rows).astype(np.int64),
    "v": rng.normal(size=rows),
    "tag": np.array(["ab", "cd", "ef", "gh"], dtype=object)[
        rng.integers(0, 4, rows)
    ],
}
build = {
    "k": np.arange(40, dtype=np.int64),
    "w": rng.normal(size=40),
}

dist = df.ExecutionContext(mesh=make_mesh())
local = df.ExecutionContext()  # single addressable device, no collectives
for ctx in (dist, local):
    ctx.register_table("t", df.Table.from_pydict(dict(data)))
    ctx.register_table("b", df.Table.from_pydict(dict(build)))

QUERIES = [
    # scan/filter/project, partitioned output all-gathered to host
    "SELECT k, v FROM t WHERE v > 1.5 AND k < 10",
    # distributed grouped aggregate (partial merge over the mesh)
    "SELECT k, COUNT(k), MIN(v), MAX(v) FROM t GROUP BY k ORDER BY k",
    # string group keys
    "SELECT tag, COUNT(tag) FROM t GROUP BY tag ORDER BY tag",
    # ungrouped aggregate: psum/pmin/pmax merges
    "SELECT COUNT(k), MIN(v), MAX(v) FROM t",
    # broadcast join + aggregate on top
    "SELECT t.k, COUNT(w) FROM t JOIN b ON t.k = b.k GROUP BY t.k ORDER BY 1",
    # global sort + limit
    "SELECT k, v FROM t ORDER BY v DESC LIMIT 5",
]
FLOAT_TOL = [
    "SELECT k, SUM(v), AVG(v) FROM t GROUP BY k ORDER BY k",
]

for q in QUERIES:
    got = dist.sql(q).result_str()
    want = local.sql(q).result_str()
    assert got == want, f"[p{pid}] mismatch for {q!r}:\n{got[:400]}\nvs\n{want[:400]}"

for q in FLOAT_TOL:
    got = dist.sql(q).to_pylist()
    want = local.sql(q).to_pylist()
    assert len(got) == len(want), q
    for g, w in zip(got, want):
        gv, wv = list(g.values()), list(w.values())
        assert gv[0] == wv[0], q
        np.testing.assert_allclose(gv[1:], wv[1:], rtol=1e-9, err_msg=q)

# ---- per-process CSV shard ingest + global dictionary merge ---------------
# Each process reads its OWN shard file with a DISJOINT string vocab;
# merge_string_dictionaries must produce one consistent global dict so
# Utf8 group-by/join/sort/compare work across hosts (SURVEY §7 hard
# part; VERDICT r3 next #5 — this block is the per-host-sharded-ingest
# coverage the suite lacked).
import csv as _csv
import tempfile

from datafusion_tpu import DataType as D, Field, Schema
from datafusion_tpu.parallel.multihost import register_csv_shards

shard_rows = 600
rng2 = np.random.default_rng(11)  # identical stream on every process
shards = []
for p in range(nproc):
    tags = [f"host{p}_{int(i)}" for i in rng2.integers(0, 7, shard_rows)]
    ks = rng2.integers(0, 25, shard_rows).astype(np.int64)
    vs = np.round(rng2.normal(size=shard_rows), 6)
    shards.append((tags, ks, vs))

tmpdir = tempfile.gettempdir()
mypath = os.path.join(tmpdir, f"dftpu_shard_{port}_{pid}.csv")
dimpath = os.path.join(tmpdir, f"dftpu_dimshard_{port}_{pid}.csv")
with open(mypath, "w", newline="") as f:
    w = _csv.writer(f)
    for tg, kk, vv in zip(*shards[pid]):
        w.writerow([tg, int(kk), float(vv)])
with open(dimpath, "w", newline="") as f:
    w = _csv.writer(f)
    for i in range(7):  # this host's tags only: dim vocabs are disjoint too
        w.writerow([f"host{pid}_{i}", pid * 100 + i])

sschema = Schema(
    [Field("tag", D.Utf8, False), Field("k", D.Int64, False), Field("v", D.Float64, False)]
)
dschema = Schema([Field("tag", D.Utf8, False), Field("w", D.Int64, False)])
dist2 = df.ExecutionContext(mesh=make_mesh())
register_csv_shards(dist2, "s", mypath, sschema, has_header=False)
register_csv_shards(dist2, "d", dimpath, dschema, has_header=False)

local2 = df.ExecutionContext()
local2.register_table(
    "s",
    df.Table.from_pydict(
        {
            "tag": np.array(sum([list(s[0]) for s in shards], []), dtype=object),
            "k": np.concatenate([s[1] for s in shards]),
            "v": np.concatenate([s[2] for s in shards]),
        }
    ),
)
local2.register_table(
    "d",
    df.Table.from_pydict(
        {
            "tag": np.array(
                [f"host{p}_{i}" for p in range(nproc) for i in range(7)],
                dtype=object,
            ),
            "w": np.array(
                [p * 100 + i for p in range(nproc) for i in range(7)],
                dtype=np.int64,
            ),
        }
    ),
)

SHARD_QUERIES = [
    # Utf8 group-by over the merged dictionary
    "SELECT tag, COUNT(v) FROM s GROUP BY tag ORDER BY tag",
    # Utf8 sort (code order must equal string order post-merge)
    "SELECT tag, k FROM s ORDER BY tag, k, v LIMIT 20",
    # Utf8 MIN/MAX across hosts
    "SELECT MIN(tag), MAX(tag) FROM s",
    # literal compare against a value only host 1 ever saw
    "SELECT COUNT(tag) FROM s WHERE tag = 'host1_3'",
    # Utf8 equi-join between two shard-ingested tables
    "SELECT s.tag, w, COUNT(v) FROM s JOIN d ON s.tag = d.tag "
    "GROUP BY s.tag, w ORDER BY 1",
]
for q in SHARD_QUERIES:
    got = dist2.sql(q).result_str()
    want = local2.sql(q).result_str()
    assert got == want, f"[p{pid}] shard mismatch {q!r}:\n{got[:400]}\nvs\n{want[:400]}"

try:
    os.remove(mypath)
    os.remove(dimpath)
except OSError:
    pass

print(f"MULTIPROC-OK {pid}", flush=True)
