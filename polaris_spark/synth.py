"""Deterministic synthetic transcripts corpus (FIXTURES.md §1).

One row = one turn = one document, exactly the ``input_hint`` shape:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``. Seeded (default 42) and fully deterministic — same args →
byte-identical table. No external data.

Text mixes Zipfian natural-language vocab (~5k terms), code-like identifiers
(camelCase / snake_case / Dotted.Qualified.Names), punctuation, ~1% empty
strings, and (optionally) a skew-fixture hot term appearing in ~30% of turns.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

TOOLS = [
    "bash", "read_file", "write_file", "web.search", "web.fetch", "grep",
    "glob", "edit", "python_repl", "sql.query", "git.diff", "git.commit",
    "list_dir", "http.get", "http.post", "notebook.run", "image.render",
    "task.spawn", "memory.read", "memory.write",
]

ROLES = ["user", "assistant", "tool"]

_SYL = ["ka", "ri", "to", "ne", "sa", "mu", "el", "or", "in", "da",
        "ve", "lo", "pi", "sh", "an", "ter", "con", "pre", "sta", "ble"]


def make_vocab(n: int = 5000, seed: int = 42) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = []
    seen = set()
    while len(vocab) < n:
        k = rng.integers(2, 5)
        w = "".join(_SYL[i] for i in rng.integers(0, len(_SYL), size=k))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def make_transcripts(
    n_turns: int = 10_000,
    turns_per_conv: int = 20,
    seed: int = 42,
    hot_term: str | None = None,
    hot_frac: float = 0.30,
    hot_tool_frac: float = 0.20,
) -> pd.DataFrame:
    """Deterministic transcripts table as pandas (small scale)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(5000, seed))
    # Zipfian ranks over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks) / (1.0 / ranks).sum()

    conv_ids = np.array([f"conv-{i // turns_per_conv:08d}" for i in range(n_turns)])
    turn_idx = (np.arange(n_turns) % turns_per_conv).astype(np.int32)
    roles = np.array([ROLES[i % 3] for i in range(n_turns)])

    texts = []
    n_words = rng.integers(3, 40, size=n_turns)
    empty_mask = rng.random(n_turns) < 0.01
    for i in range(n_turns):
        if empty_mask[i]:
            texts.append("")
            continue
        words = list(vocab[rng.choice(len(vocab), size=n_words[i], p=zipf_p)])
        # sprinkle code-like identifiers
        n_ids = int(rng.integers(0, 4))
        for _ in range(n_ids):
            kind = rng.integers(0, 3)
            parts = vocab[rng.choice(200, size=rng.integers(2, 4))]
            if kind == 0:
                ident = parts[0] + "".join(p.capitalize() for p in parts[1:])
            elif kind == 1:
                ident = "_".join(parts)
            else:
                ident = ".".join(p.capitalize() for p in parts)
            words.insert(int(rng.integers(0, len(words) + 1)), ident)
        if hot_term is not None and rng.random() < hot_frac:
            words.insert(int(rng.integers(0, len(words) + 1)), hot_term)
        # punctuation mix
        sep = rng.choice([" ", " ", " ", "; ", ", ", " (", ") ", " = "], size=len(words))
        texts.append("".join(w + s for w, s in zip(words, sep)).strip())

    tools = np.where(
        roles == "tool",
        np.array(TOOLS)[rng.integers(0, len(TOOLS), size=n_turns)],
        "",
    )
    if hot_term is not None:
        hot_tool_mask = (roles == "tool") & (rng.random(n_turns) < hot_tool_frac / (1 / 3))
        tools = np.where(hot_tool_mask, "web.search", tools)

    base = np.datetime64("2026-01-01T00:00:00")
    ts = base + np.arange(n_turns).astype("timedelta64[s]")

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def write_transcripts_parquet(path: str, n_turns: int, seed: int = 42, **kw) -> str:
    """Write the deterministic corpus as a DIRECTORY of parquet part files
    (~20k turns each) — a splittable input like any real table, so Spark
    parallelizes the scan instead of serializing on one giant row group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    chunk = 20_000
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    os.makedirs(path, exist_ok=True)
    done = 0
    part = 0
    while done < n_turns:
        n = min(chunk, n_turns - done)
        df = make_transcripts(n_turns=n, seed=seed + part, **kw)
        # keep conv ids globally unique across chunks
        df["conv_id"] = df["conv_id"].str.replace("conv-", f"conv-{part:03d}-", regex=False)
        pq.write_table(
            pa.Table.from_pandas(df, schema=schema, preserve_index=False),
            os.path.join(path, f"part-{part:05d}.parquet"),
        )
        done += n
        part += 1
    return path
