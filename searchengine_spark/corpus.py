"""Deterministic synthetic `transcripts` corpus generator.

BASELINE.json `input_hint` fixes the input shape:
``transcripts(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)`` — multi-turn conversation / agent
transcripts.  No transcripts table ships in /root/testdata, so we
synthesize one deterministically (seeded numpy, no wall clock, no
external data) at the same sf tiers as TESTDATA.md.

Corpus properties engineered for the test plan (FIXTURES.md §1, §5):

- zipf-ish conversation lengths and term frequencies;
- heavy-hitter terms (stopword-like high-df tokens from conversational
  text — the salting candidates of BASELINE.json north_rule);
- planted typo variants (`serach`, `qurey`, `modle`) at low frequency
  for Fuzziness=1 tests (reference `internal/search/search.go:122`);
- Cyrillic synonym-group tokens (`кепка шапка бейсболка панама`,
  reference `internal/index/index.go:214`);
- roles user/assistant/system/tool; tool column ''/bash/search/browser;
- monotone per-conversation timestamps from a fixed base epoch.

``doc_id = conv_id || ':' || %04d(turn_idx)`` (zero-padded so string
order == (conv_id, turn_idx) order — the stable-ordering invariant).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

# ~230-word conversational/technical vocabulary. Frequencies follow a
# zipf draw over this order, so early words are the heavy hitters.
_COMMON = """
the a and of to is in it for on not that this with as at be or an
i you we ok yes can now run see get use one two here done next let me
need want help make sure just like time file code test data model query
plan spark table join scan index term search token text turn tool agent
user result error fail pass check read write load save run build start
stop first last more less same new old good fast slow big small batch
stream shuffle partition broadcast filter sort group count sum merge
split cache disk memory core task stage job driver executor row column
key value hash range bucket skew salt block score rank match fuzzy
""".split()

_TAIL_SYLLABLES = ["ka", "ro", "mi", "ta", "lu", "ben", "sor", "vel", "dun", "pra", "zo", "qui", "fen", "gal", "hup"]

# typo variants planted at low frequency for fuzzy (edit distance 1) tests
_TYPOS = ["serach", "qurey", "modle", "indx", "tokne"]
_CYRILLIC = ["кепка", "шапка", "бейсболка", "панама", "поиск", "индекс"]

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "bash", "search", "browser"])

SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)


def _vocab() -> list[str]:
    rng = np.random.default_rng(SEED + 1)
    tail = []
    seen = set(_COMMON)
    while len(tail) < 1800:
        w = "".join(rng.choice(_TAIL_SYLLABLES, size=rng.integers(2, 5)))
        if w not in seen:
            seen.add(w)
            tail.append(w)
    return list(_COMMON) + _CYRILLIC + _TYPOS + tail


VOCAB = _vocab()


def n_turns_for_sf(sf: float) -> int:
    return max(200, int(round(2_000_000 * sf)))


def generate(sf: float) -> pa.Table:
    """Generate the transcripts table for a scale factor, deterministically."""
    rng = np.random.default_rng(SEED)
    n = n_turns_for_sf(sf)
    vocab = np.array(VOCAB)
    nv = len(vocab)

    # conversation lengths: clipped zipf, mean ~8 turns
    conv_lens: list[int] = []
    total = 0
    while total < n:
        ln = int(min(40, max(1, rng.zipf(1.6))))
        conv_lens.append(ln)
        total += ln
    conv_lens[-1] -= total - n
    if conv_lens[-1] == 0:
        conv_lens.pop()
    lens = np.array(conv_lens)
    n_conv = len(lens)

    conv_num = np.repeat(np.arange(n_conv), lens)
    turn_idx = np.concatenate([np.arange(ln) for ln in lens]).astype(np.int32)
    conv_id = np.char.add("c", np.char.zfill(conv_num.astype(str), 7))

    # roles: turn 0 of ~20% convs is system; then alternate user/assistant
    # with ~12% tool turns after an assistant turn
    role_draw = rng.random(n)
    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    role = np.where((turn_idx == 0) & (role_draw < 0.2), "system", role)
    role = np.where((role == "assistant") & (role_draw < 0.12), "tool", role)

    tool = np.where(
        (role == "tool") | ((role == "assistant") & (rng.random(n) < 0.25)),
        rng.choice(TOOLS[1:], size=n),
        "",
    )

    # per-turn token counts: lognormal 5..60
    tok_counts = np.clip(np.round(np.exp(rng.normal(2.6, 0.6, size=n))), 4, 60).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(tok_counts)])
    total_toks = int(offsets[-1])

    # zipf term draw over vocab ranks (a=1.15 → heavy head, long tail)
    ranks = rng.zipf(1.15, size=total_toks * 2)
    ranks = ranks[ranks <= nv][:total_toks]
    while len(ranks) < total_toks:
        extra = rng.zipf(1.15, size=total_toks)
        ranks = np.concatenate([ranks, extra[extra <= nv]])[:total_toks]
    words = vocab[ranks - 1]

    texts = [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(n)]

    # timestamps: each conversation starts at base + conv_num * 97s,
    # turns 13s apart — monotone within conv, deterministic
    ts_us = BASE_EPOCH_US + conv_num * 97_000_000 + turn_idx.astype(np.int64) * 13_000_000

    return pa.Table.from_arrays(
        [
            pa.array(conv_id, type=pa.string()),
            pa.array(turn_idx, type=pa.int32()),
            pa.array(role, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(tool, type=pa.string()),
            pa.array(ts_us, type=pa.timestamp("us")),
        ],
        schema=SCHEMA,
    )


def transcripts_path(sf: float, root: str = "/root/repo/data/transcripts") -> str:
    return os.path.join(root, f"sf{sf:g}", "transcripts.parquet")


def ensure_transcripts(sf: float, root: str = "/root/repo/data/transcripts") -> str:
    """Write the corpus parquet for `sf` if missing; return its path."""
    path = transcripts_path(sf, root)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(generate(sf), tmp, row_group_size=64 * 1024)
        os.replace(tmp, path)
    return path


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a /root/testdata/sf0.01-style dir."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        return float(base[2:])
    return 0.01
