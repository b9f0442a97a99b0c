"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Produces the `transcripts(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)` table mandated by
BASELINE.json `input_hint`, seeded (default 42) so every run — oracle,
Spark tests, bench at two parallelism levels — sees byte-identical
input. No external data.

Shape knobs mirror what the reference's datasets stress
(SURVEY.md §1.2, FIXTURES.md):
  - conv_ids include whitespace / '<' / '>' variants (exercises the
    suffix() sanitization rules, reference triplifier.js:18-22);
  - role is enum-valued with some NULLs (enum -> IRI resolution incl.
    the NULL -> rdf:nil row, reference triplifier.js:373-399 +
    mappings-to-rdf.js:1159-1163);
  - tool is NULL / '' / Zipf-hot names ('' -> rdf:nil empty-object
    semantics, reference src/data/worker.js:218-220; Zipf -> skew);
  - conversation lengths long-tailed (a few huge conversations among
    mostly short ones -> AQE skew-join / salting exercise);
  - text embeds seeded `@entity:NAME` mentions, some near-duplicate
    surfaces (entity-linking fodder), some empty/very long texts.

Generation is pandas/numpy vectorized and written as parquet; tests and
bench read it with spark.read.parquet. At real scale the same frame
would be an Iceberg table — parquet-on-dir is the sandbox stand-in with
identical scan semantics (split planning, pushdown, pruning).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "system", "tool"]

# entity surface pool: clusters of near-duplicate surfaces that the
# linking stage must resolve to one canonical entity each.
ENTITY_CLUSTERS = [
    ["Apache_Spark", "apache_spark", "APACHE_SPARK", "Apache_spark"],
    ["Iceberg", "iceberg", "ICEBERG"],
    ["DataFrame", "dataframe", "Data_Frame"],
    ["Catalyst", "catalyst"],
    ["Neptune", "neptune", "NEPTUNE"],
    ["Fuseki", "fuseki"],
    ["turtle<fmt>", "Turtle<FMT>"],  # sanitization-stressing surfaces
    ["GraphQL", "graphql"],
    ["Arrow", "arrow", "ARROW"],
    ["Gremlin", "gremlin"],
]

TOOLS = [
    "search",  # Zipf-hot head
    "browser",
    "python",
    "calculator",
    "sql_runner",
    "file reader",  # whitespace -> sanitizer exercise
    "x<ray>",  # <> -> sanitizer exercise
    "rare_tool_1",
    "rare_tool_2",
    "rare_tool_3",
]

WORDS = (
    "the quick model agent replied with a plan to query the graph and "
    "join the results over partitioned tables while the user asked about "
    "schema evolution and ordered lists of elements in the vocabulary"
).split()


_SYLLABLES = ["ka", "ro", "vin", "tez", "mul", "qor", "ban", "sil", "dra",
              "fen", "gor", "hax", "jul", "kem", "lor", "nim", "pra", "rus",
              "tav", "wex", "yol", "zem", "bri", "cho", "dug", "eph"]


def entity_pool(n_entities: int) -> list[list[str]]:
    """Programmatic entity-surface clusters for linking at scale: each
    entity gets a syllable-hashed base name (so DISTINCT entities share
    few character n-grams and must NOT merge) and 4 near-duplicate
    variants (title/lower/UPPER/underscored) that MUST merge.
    Deterministic by construction (md5-driven, no RNG state)."""
    import hashlib

    pool = []
    for i in range(n_entities):
        h = hashlib.md5(f"entity-{i}".encode()).hexdigest()
        syls = [_SYLLABLES[int(h[j:j + 2], 16) % len(_SYLLABLES)]
                for j in (0, 2, 4, 6)]
        base = "".join(s.capitalize() for s in syls) + h[8:12]
        pool.append([base, base.lower(), base.upper(),
                     "_".join(syls) + "_" + h[8:12]])
    return pool


def make_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    hot_conv_turns: int = 1000,
    n_hot_convs: int = 2,
    n_entities: int | None = None,
) -> pd.DataFrame:
    """Build a deterministic transcripts frame.

    Conversation lengths ~ long-tailed: `n_hot_convs` conversations get
    `hot_conv_turns` turns; the rest draw 5..50.

    n_entities: if set, mention surfaces draw from a programmatic pool
    of that many entities with Zipf-distributed popularity (hot-entity
    skew for the linking stage) instead of the small fixed
    ENTITY_CLUSTERS used by the oracle tests.
    """
    rng = np.random.default_rng(seed)
    clusters = ENTITY_CLUSTERS if n_entities is None else entity_pool(n_entities)
    if n_entities is None:
        cluster_w = np.full(len(clusters), 1.0 / len(clusters))
    else:  # Zipf popularity: a few hot entities dominate mentions
        cluster_w = 1.0 / np.arange(1, len(clusters) + 1) ** 1.2
        cluster_w /= cluster_w.sum()

    lengths = rng.integers(5, 51, size=n_convs)
    for i in range(min(n_hot_convs, n_convs)):
        lengths[i] = hot_conv_turns

    conv_ids = []
    for i in range(n_convs):
        if i % 17 == 3:
            conv_ids.append(f"conv {i:05d}")  # whitespace
        elif i % 23 == 5:
            conv_ids.append(f"conv<{i:05d}>")  # angle brackets
        else:
            conv_ids.append(f"conv-{i:05d}")

    n_total = int(lengths.sum())
    conv_col = np.repeat(np.array(conv_ids, dtype=object), lengths)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lengths])

    # roles: mostly alternating user/assistant, sprinkle system/tool/NULL
    role_draw = rng.random(n_total)
    roles = np.where(
        turn_idx % 2 == 0, "user", "assistant"
    ).astype(object)
    roles[role_draw < 0.08] = "system"
    roles[(role_draw >= 0.08) & (role_draw < 0.20)] = "tool"
    roles[role_draw > 0.985] = None  # NULL role -> rdf:nil enum row

    # tools: only on tool-role turns; Zipf-distributed over TOOLS,
    # a few empty strings (-> rdf:nil), never set otherwise.
    zipf_w = 1.0 / np.arange(1, len(TOOLS) + 1) ** 1.5
    zipf_w /= zipf_w.sum()
    tool_pick = rng.choice(len(TOOLS), size=n_total, p=zipf_w)
    tools = np.full(n_total, None, dtype=object)
    is_tool_turn = roles == "tool"
    tools[is_tool_turn] = np.array(TOOLS, dtype=object)[tool_pick[is_tool_turn]]
    empty_mask = is_tool_turn & (rng.random(n_total) < 0.03)
    tools[empty_mask] = ""

    # text: 3..20 words, 0..2 entity mentions inserted at seeded spots
    n_words = rng.integers(3, 21, size=n_total)
    word_pick = rng.integers(0, len(WORDS), size=(n_total, 20))
    n_mentions = rng.choice([0, 1, 2], size=n_total, p=[0.45, 0.40, 0.15])
    cluster_pick = rng.choice(len(clusters), size=(n_total, 2), p=cluster_w)
    variant_pick = rng.integers(0, 4, size=(n_total, 2))
    long_mask = rng.random(n_total) < 0.002  # a few very long texts
    empty_text = rng.random(n_total) < 0.01
    url_mask = rng.random(n_total) < 0.10    # url mentions
    email_mask = rng.random(n_total) < 0.05  # email mentions
    url_pick = rng.integers(0, 20, size=n_total)
    email_pick = rng.integers(0, 12, size=n_total)

    texts = np.empty(n_total, dtype=object)
    for i in range(n_total):
        if empty_text[i]:
            texts[i] = ""
            continue
        ws = [WORDS[w] for w in word_pick[i, : n_words[i]]]
        for m in range(n_mentions[i]):
            cluster = clusters[cluster_pick[i, m]]
            surface = cluster[variant_pick[i, m] % len(cluster)]
            pos = (i * 7 + m * 3) % (len(ws) + 1)
            ws.insert(pos, f"@entity:{surface}")
        if url_mask[i]:
            ws.append(f"https://docs.example.org/page_{url_pick[i]:02d}")
        if email_mask[i]:
            ws.insert(0, f"user.{email_pick[i]:02d}@example.com")
        t = " ".join(ws)
        if long_mask[i]:
            t = (t + " ") * 50
        texts[i] = t

    base = datetime(2025, 1, 1, tzinfo=timezone.utc)
    # ts monotone within conv: base + conv_offset_days + turn_idx minutes
    conv_offset = np.repeat(np.arange(n_convs), lengths)
    ts = (
        np.datetime64(base.replace(tzinfo=None))
        + conv_offset.astype("timedelta64[D]")
        + turn_idx.astype("timedelta64[m]")
    )

    return pd.DataFrame(
        {
            "conv_id": conv_col,
            "turn_idx": turn_idx.astype("int32"),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.Series(ts),
        }
    )


def write_transcripts_parquet(
    out_dir: str,
    n_convs: int = 100,
    seed: int = 42,
    hot_conv_turns: int = 1000,
    n_hot_convs: int = 2,
    n_files: int = 8,
    n_entities: int | None = None,
) -> str:
    """Materialize the frame as a multi-file parquet dir (so Spark's
    split planning has >1 input split even at tiny scale). Idempotent:
    skips if the dir already has a _SUCCESS marker for the same params."""
    os.makedirs(out_dir, exist_ok=True)
    # marker carries a generator version: bump when make_transcripts'
    # output changes so cached corpora regenerate
    marker = os.path.join(
        out_dir,
        f"_SYNTH_v2_{n_convs}_{seed}_{hot_conv_turns}_{n_hot_convs}_{n_files}"
        f"_{n_entities}"
    )
    if os.path.exists(marker):
        return out_dir
    for f in os.listdir(out_dir):
        os.remove(os.path.join(out_dir, f))
    pdf = make_transcripts(n_convs, seed, hot_conv_turns, n_hot_convs,
                           n_entities)
    # shard round-robin by conversation so conversations stay contiguous
    # within a file (mirrors how an Iceberg write bucketed by conv_id
    # would lay the data out) but files stay balanced.
    convs = pdf["conv_id"].unique()
    assign = {c: i % n_files for i, c in enumerate(convs)}
    shard = pdf["conv_id"].map(assign)
    for i in range(n_files):
        part = pdf[shard == i]
        part.to_parquet(os.path.join(out_dir, f"part-{i:04d}.parquet"), index=False)
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
