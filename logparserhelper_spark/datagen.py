"""Deterministic synthetic transcript generator (FIXTURES.md).

Produces the ``transcripts`` fact table from BASELINE.json's input_hint —
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp) — plus the ``role_dim`` / ``tool_dim`` broadcast dimensions,
at three scales:

- ``tiny``   (~2k turns)  — unit/CI,
- ``small``  (~200k turns) — correctness vs the oracle,
- ``bench``  (~5M turns)  — two-parallelism scaling runs.

Everything is seeded (seed=42, no wall clock). Text rows mix:
(a) lines styled after the 6 reference sample corpora
    (/root/reference/data/sample_logs) with the golden-pinned property that
    only the Linux-syslog and Zookeeper styles match the bank;
(b) chat prose with 0-2 embedded timestamps drawn from the 8 bank formats
    (duplicate-pattern multicast + multi-match-per-turn cases);
(c) ~35% turns matching no pattern (``unmatched`` sink is first-class).

Skew: one conversation per scale gets 100x the median turn count (exercises
conv_id salting). ~0.5% of (conv_id, turn_idx) pairs are duplicated with
different text (exercises stable-order dedup with the documented total-order
tiebreak (role, ts, text)).

Output is plain parquet written via pyarrow in chunks (no Spark needed to
generate), cached under the target directory; regeneration is skipped when
the marker file exists.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS = datetime(2025, 6, 6, 0, 0, 0, tzinfo=timezone.utc)
MEDIAN_TURNS = 12

SCALES = {
    # name: (n_convs, lognormal sigma)
    "tiny": (40, 1.6),
    "small": (4000, 1.6),
    "bench": (80000, 1.6),
    # 'large' exists for the two-parallelism scaling run: the job must be
    # long enough at local[8] that fixed driver/scheduling overhead (~10s)
    # is <8% of wall, else Amdahl caps measurable efficiency below the 0.8
    # target no matter how well the parallel fraction scales.
    "large": (400000, 1.6),
    # 'xlarge' is the ~100M-turn capacity probe (6x 'large'): big enough
    # that the single-exchange parse stage must spill-manage shuffle blocks
    # well past executor memory comfort, small enough to generate and hold
    # on this sandbox's disk.
    "xlarge": (2350000, 1.6),
}

ROLES = ["user", "assistant", "system", "tool"]
ROLE_WEIGHTS = [0.40, 0.40, 0.05, 0.15]

TOOLS = [
    "bash", "grep", "read", "write", "edit", "search",
    "fetch", "sql", "browser", "test", "deploy", "none",
]

ROLE_DIM_ROWS = [
    ("user", "human", True),
    ("assistant", "model", False),
    ("system", "control", False),
    ("tool", "machine", False),
]

TOOL_DIM_ROWS = [
    ("bash", "shell", True),
    ("grep", "search", False),
    ("read", "fs", False),
    ("write", "fs", True),
    ("edit", "fs", True),
    ("search", "search", False),
    ("fetch", "net", False),
    ("sql", "db", True),
    ("browser", "net", False),
    ("test", "ci", False),
    ("deploy", "ci", True),
    ("none", "none", False),
]

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_DAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]

_PROSE = [
    "please summarize the deployment steps",
    "the regex failed on the second capture group",
    "retrying with exponential backoff now",
    "I checked the config and nothing changed",
    "can you list the affected services",
    "compaction finished without errors",
    "the user asked for a rollback plan",
    "running the integration suite next",
    "no anomalies in the sampled window",
    "let me look at the shard allocation",
]


def _ts_variants(rng: random.Random) -> list[str]:
    """Render one random instant in each of the 8 bank-recognized formats
    (data/patterns.json:3-34). Indices align with bank pattern ids, except
    4/5 and 2/6 which share a format string (duplicate patterns)."""
    dt = BASE_TS + timedelta(seconds=rng.randrange(0, 365 * 24 * 3600))
    iso = dt.strftime("%Y-%m-%dT%H:%M:%S")
    rfc = f"{_DAYS[dt.weekday()]}, {dt.day} {_MONTHS[dt.month - 1]} {dt.year} {dt:%H:%M:%S} +0000"
    winevt = dt.strftime("%m/%d/%Y %H:%M:%S")
    apache = f"[{dt:%d}/{_MONTHS[dt.month - 1]}/{dt.year}:{dt:%H:%M:%S} +0000]"
    hdfs_zk = dt.strftime("%Y-%m-%d %H:%M:%S") + f",{rng.randrange(1000):03d}"
    # Linux syslog matches p7 only with the double space (single-digit day)
    linux = f"{_MONTHS[dt.month - 1]}  {rng.randrange(1, 10)} {dt:%H:%M:%S}"
    return [iso, rfc, winevt, apache, hdfs_zk, linux]


def _make_text(rng: random.Random) -> str:
    """One turn's text. Style mix tuned so all sinks receive traffic and
    ~35% of turns match nothing."""
    r = rng.random()
    prose = rng.choice(_PROSE)
    if r < 0.35:
        # (c) unmatched: plain prose or non-matching corpus styles
        style = rng.randrange(4)
        if style == 0:
            return prose
        dt = BASE_TS + timedelta(seconds=rng.randrange(0, 10**7))
        if style == 1:  # Android style — matches nothing
            return f"{dt:%m-%d %H:%M:%S}.{rng.randrange(1000):03d} {rng.randrange(9999)} {rng.randrange(9999)} I Tag: {prose}"
        if style == 2:  # HDFS-corpus style — matches nothing
            return f"{dt:%y%m%d %H%M%S} {rng.randrange(100)} INFO dfs.DataNode: {prose}"
        # Windows CBS style — ", Info" breaks the ,SSS suffix, matches nothing
        return f"{dt:%Y-%m-%d %H:%M:%S}, Info                  CBS    {prose}"
    v = _ts_variants(rng)
    if r < 0.50:
        # Zookeeper style: HDFS+Zookeeper duplicate multicast
        return f"{v[4]} - INFO  [main:QuorumPeer@{rng.randrange(1000)}] - {prose}"
    if r < 0.62:
        # Linux syslog style; 40% get a second in-message timestamp
        head = f"{v[5]} combo sshd(pam_unix)[{rng.randrange(30000)}]: {prose}"
        if rng.random() < 0.4:
            head += f" at {_ts_variants(rng)[5]}"
        return head
    if r < 0.72:
        return f"{rng.randrange(255)}.{rng.randrange(255)}.0.1 - - {v[3]} \"GET /idx HTTP/1.1\" 200"
    if r < 0.80:
        return f"event logged {v[2]} by {rng.randrange(100)}"  # WinEvt duplicate multicast
    if r < 0.88:
        return f"run started {v[0]} {prose}"  # ISO 8601
    if r < 0.94:
        return f"Date: {v[1]} {prose}"  # RFC 2822
    # multi-format turn: two different bank formats in one turn
    picks = rng.sample(range(6), 2)
    return f"{prose} {v[picks[0]]} then {v[picks[1]]}"


def conversation_lengths(n_convs: int, sigma: float, seed: int = SEED) -> np.ndarray:
    rs = np.random.RandomState(seed)
    lens = np.maximum(
        1, rs.lognormal(mean=np.log(MEDIAN_TURNS), sigma=sigma, size=n_convs)
    ).astype(np.int64)
    if n_convs:
        lens[min(7, n_convs - 1)] = MEDIAN_TURNS * 100  # the skew conversation
    return lens


def generate_transcripts(
    out_dir: str, scale: str = "tiny", seed: int = SEED, force: bool = False
) -> str:
    """Write ``transcripts.parquet`` (+ dims + a manifest) under out_dir.
    Returns out_dir. Idempotent via a manifest marker."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(marker) and not force:
        with open(marker) as f:
            m = json.load(f)
        if m.get("scale") == scale and m.get("seed") == seed:
            return out_dir

    n_convs, sigma = SCALES[scale]
    lens = conversation_lengths(n_convs, sigma, seed)
    rng = random.Random(seed)

    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    path = os.path.join(out_dir, "transcripts.parquet")
    writer = pq.ParquetWriter(path, schema, compression="snappy")

    cols: dict[str, list] = {k: [] for k in
                             ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    total_rows = 0

    def flush() -> None:
        nonlocal total_rows
        if not cols["conv_id"]:
            return
        batch = pa.record_batch(
            [
                pa.array(cols["conv_id"], pa.string()),
                pa.array(cols["turn_idx"], pa.int32()),
                pa.array(cols["role"], pa.string()),
                pa.array(cols["text"], pa.string()),
                pa.array(cols["tool"], pa.string()),
                pa.array(cols["ts"], pa.timestamp("us", tz="UTC")),
            ],
            schema=schema,
        )
        writer.write_batch(batch)
        total_rows += batch.num_rows
        for v in cols.values():
            v.clear()

    for ci in range(n_convs):
        conv_id = f"conv-{ci:08d}"
        conv_base = BASE_TS + timedelta(seconds=ci * 60)
        for ti in range(int(lens[ci])):
            role = rng.choices(ROLES, weights=ROLE_WEIGHTS, k=1)[0]
            tool = rng.choice(TOOLS) if role == "tool" else None
            ts = conv_base + timedelta(seconds=ti)
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(ti)
            cols["role"].append(role)
            cols["text"].append(_make_text(rng))
            cols["tool"].append(tool)
            cols["ts"].append(ts)
            if rng.random() < 0.005:  # duplicated (conv_id, turn_idx), later ts
                cols["conv_id"].append(conv_id)
                cols["turn_idx"].append(ti)
                cols["role"].append(rng.choices(ROLES, weights=ROLE_WEIGHTS, k=1)[0])
                cols["text"].append(_make_text(rng))
                cols["tool"].append(None)
                cols["ts"].append(ts + timedelta(microseconds=500000))
        if len(cols["conv_id"]) >= 200_000:
            flush()
    flush()
    writer.close()

    _write_dims(out_dir)
    with open(marker, "w") as f:
        json.dump({"scale": scale, "seed": seed, "rows": total_rows,
                   "n_convs": n_convs}, f)
    return out_dir


def _gen_shard(args: tuple) -> tuple[str, int]:
    """One shard of the parallel generator: conversations [lo, hi) with a
    shard-local rng seeded (seed, lo) — deterministic for a fixed shard
    plan, independent of worker scheduling. Same row recipe as the
    sequential path (roles, tools, ~0.5% duplicated turn keys)."""
    out_path, lo, hi, lens_slice, seed = args
    rng = random.Random(f"{seed}:{lo}")
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    writer = pq.ParquetWriter(out_path, schema, compression="snappy")
    cols: dict[str, list] = {k: [] for k in
                             ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    total = 0

    def flush() -> None:
        nonlocal total
        if not cols["conv_id"]:
            return
        batch = pa.record_batch(
            [
                pa.array(cols["conv_id"], pa.string()),
                pa.array(cols["turn_idx"], pa.int32()),
                pa.array(cols["role"], pa.string()),
                pa.array(cols["text"], pa.string()),
                pa.array(cols["tool"], pa.string()),
                pa.array(cols["ts"], pa.timestamp("us", tz="UTC")),
            ],
            schema=schema,
        )
        writer.write_batch(batch)
        total += batch.num_rows
        for v in cols.values():
            v.clear()

    for off, ci in enumerate(range(lo, hi)):
        conv_id = f"conv-{ci:08d}"
        conv_base = BASE_TS + timedelta(seconds=ci * 60)
        for ti in range(int(lens_slice[off])):
            role = rng.choices(ROLES, weights=ROLE_WEIGHTS, k=1)[0]
            tool = rng.choice(TOOLS) if role == "tool" else None
            ts = conv_base + timedelta(seconds=ti)
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(ti)
            cols["role"].append(role)
            cols["text"].append(_make_text(rng))
            cols["tool"].append(tool)
            cols["ts"].append(ts)
            if rng.random() < 0.005:
                cols["conv_id"].append(conv_id)
                cols["turn_idx"].append(ti)
                cols["role"].append(rng.choices(ROLES, weights=ROLE_WEIGHTS, k=1)[0])
                cols["text"].append(_make_text(rng))
                cols["tool"].append(None)
                cols["ts"].append(ts + timedelta(microseconds=500000))
        if len(cols["conv_id"]) >= 200_000:
            flush()
    flush()
    writer.close()
    return out_path, total


def generate_transcripts_parallel(
    out_dir: str,
    scale: str,
    seed: int = SEED,
    n_procs: int = 16,
    force: bool = False,
) -> str:
    """Multiprocess variant for the big capacity scales: conversations are
    split into ``n_procs`` contiguous shards, each written as its own file
    under ``transcripts.parquet/`` (a parquet DATASET directory — the
    source resolver and Spark read it the same as the single file).
    Deterministic for a fixed (scale, seed, n_procs): shard rngs are seeded
    by "seed:shard_lo", so output does not depend on worker scheduling.
    NOT byte-identical to the sequential generator — use for capacity
    probes, not for re-generating the committed sequential scales."""
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(marker) and not force:
        with open(marker) as f:
            m = json.load(f)
        if (m.get("scale"), m.get("seed"), m.get("n_procs")) == (scale, seed, n_procs):
            return out_dir

    n_convs, sigma = SCALES[scale]
    lens = conversation_lengths(n_convs, sigma, seed)
    ds_dir = os.path.join(out_dir, "transcripts.parquet")
    if os.path.isfile(ds_dir):
        os.remove(ds_dir)
    # wipe any previous dataset: regenerating with fewer shards must not
    # leave stale shard files mixed into the directory (a reader would see
    # more rows than the manifest claims)
    if os.path.isdir(ds_dir):
        import shutil

        shutil.rmtree(ds_dir)
    os.makedirs(ds_dir)
    bounds = [n_convs * i // n_procs for i in range(n_procs + 1)]
    jobs = [
        (
            os.path.join(ds_dir, f"shard-{i:04d}.parquet"),
            bounds[i],
            bounds[i + 1],
            lens[bounds[i]: bounds[i + 1]],
            seed,
        )
        for i in range(n_procs)
        if bounds[i + 1] > bounds[i]
    ]
    total_rows = 0
    with ProcessPoolExecutor(max_workers=n_procs) as ex:
        for _path, n in ex.map(_gen_shard, jobs):
            total_rows += n

    _write_dims(out_dir)
    with open(marker, "w") as f:
        json.dump({"scale": scale, "seed": seed, "rows": total_rows,
                   "n_convs": n_convs, "n_procs": n_procs}, f)
    return out_dir


def _write_dims(out_dir: str) -> None:
    role = pa.table(
        {
            "role": [r[0] for r in ROLE_DIM_ROWS],
            "role_kind": [r[1] for r in ROLE_DIM_ROWS],
            "is_human": [r[2] for r in ROLE_DIM_ROWS],
        }
    )
    pq.write_table(role, os.path.join(out_dir, "role_dim.parquet"))
    tool = pa.table(
        {
            "tool": [t[0] for t in TOOL_DIM_ROWS],
            "tool_family": [t[1] for t in TOOL_DIM_ROWS],
            "is_side_effecting": [t[2] for t in TOOL_DIM_ROWS],
        }
    )
    pq.write_table(tool, os.path.join(out_dir, "tool_dim.parquet"))


def reference_corpus_as_transcripts(out_dir: str, logs_dir: str = "/root/reference/data/sample_logs") -> str:
    """The 6 reference sample logs loaded as 6 conversations — one line per
    turn, role='system', tool=null, monotone ts. Bridges the Ring-1 golden
    matrix into the Spark pipeline (FIXTURES.md §5)."""
    os.makedirs(out_dir, exist_ok=True)
    cols: dict[str, list] = {k: [] for k in
                             ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for fn in sorted(os.listdir(logs_dir)):
        conv_id = fn.rsplit(".", 1)[0]
        with open(os.path.join(logs_dir, fn), encoding="utf-8", errors="replace") as f:
            lines = f.read().splitlines()
        for i, line in enumerate(lines):
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(i)
            cols["role"].append("system")
            cols["text"].append(line)
            cols["tool"].append(None)
            cols["ts"].append(BASE_TS + timedelta(seconds=i))
    table = pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us", tz="UTC")),
        }
    )
    path = os.path.join(out_dir, "transcripts.parquet")
    pq.write_table(table, path)
    _write_dims(out_dir)
    return out_dir


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="tiny", choices=sorted(SCALES))
    p.add_argument("--out", required=True)
    p.add_argument("--force", action="store_true")
    a = p.parse_args()
    d = generate_transcripts(a.out, a.scale, force=a.force)
    print(json.dumps(json.load(open(os.path.join(d, "_MANIFEST.json")))))
