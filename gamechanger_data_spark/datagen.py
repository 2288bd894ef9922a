"""Deterministic synthetic CDC feed generator (FIXTURES.md §2).

Produces timestamped batch directories of change events —
``<root>/batch=<YYYY-MM-DDTHH-MM-SS>/part-0.parquet`` plus a ``_READY``
marker — mirroring the reference's fixture corpus of timestamped
crawler-output prefixes gated by ``manifest.json`` ready-markers
(/root/reference/dev_tools/universal_test_harness/data/crawler_output/*,
 dataPipelines/gc_ingest/tools/checkpoint/utils.py:77-84).

Feed properties (all seeded, default seed=42):
  * overlapping keys across batches (update-after-insert);
  * Zipf-skewed conversation sizes — a few hot conversations own a large
    share of events (exercises key-salted repartitioning);
  * out-of-order ``ts`` within a batch and exact duplicate events
    (idempotence of LWW apply);
  * explicit ``op='revoke'`` tombstones and deletes;
  * optionally one batch carrying an additive column ``tool_version``
    (schema-evolution test);
  * messy text (unicode quotes/dashes, stray whitespace) to exercise the
    normalization chain.

Generation is vectorized numpy -> pyarrow; no Spark needed, so the same
generator parameterizes sf from 10^4 (tests) to 10^7+ (bench) and would
stamp out 10^10 on a real cluster by sharding ``batch_idx`` ranges.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# Non-hidden on purpose: Spark file sources silently filter paths starting
# with '_' or '.' (the _SUCCESS convention), which would make the marker
# invisible to the ready-marker STREAM. The reference's own marker is the
# non-hidden manifest.json (checkpoint/utils.py:77-84). "_READY" (round-1
# name) is still accepted on read for feeds already on disk.
READY_MARKER = "ready.marker"
LEGACY_READY_MARKER = "_READY"
# disjoint per-batch event_seq ranges (see generate_batch guard)
SEQ_STRIDE = 10_000_000
BATCH_PREFIX = "batch="
_BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")

_WORDS = np.array(
    "scan merge batch upsert shuffle broadcast window salt key turn text role tool "
    "agent user assistant system plan act observe reflect commit revoke delete "
    "insert update stream offset lineage manifest snapshot schema evolve".split()
)
_MESSY = np.array(["", "  ", "\t", " “q” ", " — ", " ", "\n"])


@dataclass
class FeedSpec:
    n_convs: int = 200
    max_turns: int = 20
    n_batches: int = 4
    events_per_batch: int = 2_000
    seed: int = 42
    zipf_a: float = 1.4           # conversation popularity skew
    dup_frac: float = 0.05        # exact duplicate events
    delete_frac: float = 0.03
    revoke_frac: float = 0.03
    evolve_batch: int | None = 3  # 0-based batch index that adds tool_version
    with_version_hash: bool = True  # generator-side sha256 (slow at bench scale)
    producers: tuple[str, ...] = ("alpha_crawler", "beta_crawler", "gamma_crawler")
    extra: dict = field(default_factory=dict)


def _conv_ids(n: int) -> np.ndarray:
    return np.char.add("conv", np.char.zfill(np.arange(n).astype(str), 8))


def generate_batch(spec: FeedSpec, batch_idx: int) -> pd.DataFrame:
    """One micro-batch of change events as a pandas DataFrame (vectorized)."""
    rng = np.random.default_rng(spec.seed * 1_000_003 + batch_idx)
    n = spec.events_per_batch

    # Zipf-skewed conversation choice (hot-key test); clip into range.
    conv_idx = np.minimum(rng.zipf(spec.zipf_a, n) - 1, spec.n_convs - 1)
    conv = _conv_ids(spec.n_convs)[conv_idx]
    turn = rng.integers(0, spec.max_turns, n).astype(np.int32)

    # Event time: batch base + jitter that overlaps neighboring batches
    # (out-of-order arrivals); event_seq is globally monotone pre-shuffle.
    base = batch_idx * 3_600_000_000  # 1h per batch, microseconds
    jitter = rng.integers(-1_800_000_000, 1_800_000_000, n)
    ts = _BASE_TS + (base + jitter).astype("timedelta64[us]")
    # event_seq stride: batches own disjoint SEQ_STRIDE ranges (duplicate
    # rows reuse existing seqs, so only n itself must fit). A batch larger
    # than the stride would collide ranges, breaking global monotonicity
    # AND the seq-range batch arithmetic the replay oracles rely on —
    # guard loudly; 10^10 total events shard as 10^3 batches of 10^7.
    if n > SEQ_STRIDE:
        raise ValueError(
            f"events_per_batch {n} exceeds the {SEQ_STRIDE} event_seq "
            "stride; shard into more batches instead"
        )
    event_seq = (np.int64(batch_idx) * SEQ_STRIDE + np.arange(n)).astype(np.int64)

    op = np.full(n, "update", dtype=object)
    op[rng.random(n) < 0.5] = "insert"  # insert/update are both upserts
    op[rng.random(n) < spec.delete_frac] = "delete"
    op[rng.random(n) < spec.revoke_frac] = "revoke"

    role = rng.choice(np.array(["user", "assistant", "system", "tool"]), n)
    tool = np.where(role == "tool", rng.choice(np.array(["search", "calc", "code"]), n), None)
    producer = rng.choice(np.array(spec.producers), n)

    # Deterministic messy text: function of (conv, turn, event_seq).
    w1 = _WORDS[(conv_idx * 7 + turn) % len(_WORDS)]
    w2 = _WORDS[(turn * 13 + event_seq % 97) % len(_WORDS)]
    w3 = _WORDS[event_seq % len(_WORDS)]
    mess = _MESSY[event_seq % len(_MESSY)]
    text = np.char.add(np.char.add(np.char.add(np.char.add(
        mess.astype(str), w1), " "), np.char.add(w2, "  ")), np.char.add(w3, mess.astype(str)))

    pdf = pd.DataFrame(
        {
            "op": op,
            "conv_id": conv,
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "event_seq": event_seq,
            "producer": producer,
        }
    )

    # Exact duplicates (replay/idempotence inside a batch).
    n_dup = int(n * spec.dup_frac)
    if n_dup:
        pdf = pd.concat([pdf, pdf.iloc[rng.integers(0, n, n_dup)]], ignore_index=True)

    # version_hash per the reference dict-hash contract over key fields.
    if spec.with_version_hash:
        from gamechanger_data_spark.functions.hashing import dict_hash_python

        pdf["version_hash"] = [
            dict_hash_python({"conv_id": c, "turn_idx": t, "text": x})
            for c, t, x in zip(pdf.conv_id, pdf.turn_idx, pdf.text)
        ]
    else:
        pdf["version_hash"] = None

    if spec.evolve_batch is not None and batch_idx == spec.evolve_batch:
        pdf["tool_version"] = np.where(
            pdf.tool.notna(), "v" + (pdf.event_seq % 3 + 1).astype(str), None
        )

    # Shuffle row order (out-of-order within the file).
    return pdf.sample(frac=1.0, random_state=spec.seed + batch_idx).reset_index(drop=True)


def batch_id_for(batch_idx: int) -> str:
    ts = pd.Timestamp(_BASE_TS.astype("datetime64[s]").item()) + pd.Timedelta(hours=batch_idx)
    return ts.strftime("%Y-%m-%dT%H-%M-%S")


def write_feed(root: str, spec: FeedSpec, parts_per_batch: int = 4) -> list[str]:
    """Materialize the feed as ready-marker-gated batch directories.

    Returns the list of batch directory paths in commit order. Files are
    written BEFORE the ready marker — a reader must ignore unmarked dirs
    (reference: checkpoint/utils.py:77-84).
    """
    dirs = []
    for b in range(spec.n_batches):
        pdf = generate_batch(spec, b)
        d = os.path.join(root, f"{BATCH_PREFIX}{batch_id_for(b)}")
        os.makedirs(d, exist_ok=True)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        # split into parts to exercise multi-file batches
        step = max(1, len(pdf) // parts_per_batch)
        for i, lo in enumerate(range(0, len(pdf), step)):
            pq.write_table(tbl.slice(lo, step), os.path.join(d, f"part-{i:04d}.parquet"))
        with open(os.path.join(d, READY_MARKER), "w") as f:
            f.write("ready\n")
        dirs.append(d)
    return dirs


def all_events(spec: FeedSpec) -> pd.DataFrame:
    """All batches concatenated (for the oracle)."""
    return pd.concat(
        [generate_batch(spec, b) for b in range(spec.n_batches)], ignore_index=True
    )


def pandas_oracle(events: pd.DataFrame, normalize=None) -> pd.DataFrame:
    """Independent final-state reduction (FIXTURES.md §4).

    Group by (conv_id, turn_idx); order by (ts, event_seq); the LAST event
    wins. op delete -> row absent; revoke -> row kept with is_revoked=True.
    This is a row-at-a-time reference reduction, deliberately NOT Spark.
    """
    ev = events.sort_values(["ts", "event_seq"], kind="mergesort")
    # whole-row last per key (groupby.last() would skip NaN per column)
    last = ev.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    last = last[last.op != "delete"].copy()
    last["is_revoked"] = last.op == "revoke"
    if normalize is not None:
        last["text"] = normalize(last["text"])
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "event_seq", "is_revoked"]
    return (
        last[cols]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
