"""Deterministic synthetic transcript generator.

Produces the Parquet ``transcripts`` table from FIXTURES.md §1 — one row per
turn, columns ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])`` — covering all eleven required scenarios:
plain prose, boilerplate-laden turns, placeholder/hallucination patterns,
parsable fields, medical codes (valid + invalid), unicode/OCR noise, exact
duplicates, segment boundaries, mega-conversation skew, edge rows, and
tool-output turns.

Modeled on the reference's seeded demo-data generator contract
(``/root/reference/scripts/generate_demo_data.py:21-29`` — "Deterministic
(seeded RNG); re-runs produce byte-identical output"). Same
``(seed, n_turns)`` → byte-identical Parquet.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

_VOCAB = (
    "the quick system processed every record without error and returned a "
    "clean result while the user asked about billing codes payment dates "
    "provider names and claim totals during the long support conversation "
    "about insurance forms that needed careful review before final approval"
).split()

_BANNERS = [
    "HOME | ABOUT | CONTACT | LOGIN | REGISTER",
    "Subscribe to our newsletter — click here for updates!",
    "Copyright © 2024 ExampleCorp. All rights reserved.",
    "Privacy Policy | Terms of Service | Cookie Settings",
    "Follow us on social media — share this article",
    "ADVERTISEMENT\nSponsored content — click here",
]

_SEPARATORS = ["----------------", "================", "****************"]

_PLACEHOLDER_SNIPPETS = [
    "N/A", "TBD", "XXXX", "John Doe", "123 Main St", "12345", "000000",
    "1111111", "Test 1", "unknown", "lorem ipsum",
]

_DATE_SNIPPETS = [
    "01/15/2024", "2024-01-15", "Jan 1, 2024", "January 15, 2024",
    "15 January 2024", "1-15-2024", "01/15/24", "12/31/2030", "01/01/1900",
]

_CURRENCY_SNIPPETS = ["$1,234.56", "(500.00)", "$99.99", "100.00-", "250 CR", "$0.01"]

_NAME_SNIPPETS = [
    "Name: DR. JOHN SMITH MD", "Patient: Jane Rivera", "Provider: MS. ANA LOPEZ RN",
    "Customer: José García", "Physician: Robert Chen Jr",
]

_INVALID_CODES = ["1234567890", "99999", "U99.9999X", "0000000000"]

_NOISE_CHARS = ["​", "‍", "﻿", "\x07", "\x1f"]
_CURLY = ["“quoted”", "‘single’"]

_EPOCH = datetime(2024, 1, 1)


def make_valid_npi(rng: random.Random) -> str:
    """Random Luhn-valid NPI (CMS 80840-prefixed Luhn, check digit derived)."""
    body = str(rng.choice("12")) + "".join(rng.choice("0123456789") for _ in range(8))
    digits = [int(c) for c in reversed("80840" + body)]
    total = 0
    for i, d in enumerate(digits):
        # positions shift by one once the check digit is appended,
        # so double the even indices here
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    check = (10 - total % 10) % 10
    return body + str(check)


def _prose(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_VOCAB) for _ in range(n_words)]
    # sentence-ish punctuation
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i % 11 == 10:
            out[-1] += "."
    return " ".join(out)


def _turn_text(rng: random.Random, kind: str) -> str:
    if kind == "plain":
        return _prose(rng, rng.randint(20, 80))
    if kind == "boilerplate":
        main = _prose(rng, rng.randint(25, 60))
        parts = [rng.choice(_BANNERS), rng.choice(_SEPARATORS), main,
                 rng.choice(_SEPARATORS), rng.choice(_BANNERS)]
        if rng.random() < 0.5:
            parts.insert(2, "More: https://example.com/a https://example.com/b")
        return "\n\n".join(parts)
    if kind == "placeholder":
        return "\n\n".join([
            _prose(rng, rng.randint(10, 30)),
            " ".join(rng.sample(_PLACEHOLDER_SNIPPETS, rng.randint(2, 5))),
        ])
    if kind == "fields":
        bits = [_prose(rng, 15),
                f"Service date {rng.choice(_DATE_SNIPPETS)} total {rng.choice(_CURRENCY_SNIPPETS)}",
                rng.choice(_NAME_SNIPPETS)]
        return "\n\n".join(bits)
    if kind == "codes":
        codes = [f"NPI {make_valid_npi(rng)}", f"CPT: 992{rng.randint(10, 49)}",
                 f"Diagnosis E11.{rng.randint(0, 9)}", f"ref {rng.choice(_INVALID_CODES)}"]
        return _prose(rng, 12) + "\n\n" + " ".join(rng.sample(codes, rng.randint(2, 4)))
    if kind == "noise":
        t = _prose(rng, rng.randint(15, 40))
        pos = rng.randint(0, len(t) - 1)
        return (t[:pos] + rng.choice(_NOISE_CHARS) + t[pos:]
                + " " + rng.choice(_CURLY) + " José García était là")
    if kind == "header":
        return f"# Section {rng.randint(1, 9)}\n\n" + _prose(rng, rng.randint(20, 50))
    if kind == "empty":
        return rng.choice(["", "   ", "\n\n", "\t"])
    raise ValueError(kind)


_TURN_KINDS = ["plain", "plain", "plain", "boilerplate", "placeholder",
               "fields", "codes", "noise", "header"]


def _emit_conversation(rng: random.Random, conv_id: str, n_turns: int,
                       rows: list[tuple]) -> None:
    ts = _EPOCH + timedelta(seconds=rng.randint(0, 365 * 24 * 3600))
    dup_pool: list[str] = []
    for i in range(n_turns):
        r = rng.random()
        if i == 0 and rng.random() < 0.3:
            role, tool = "system", ""
            text = "You are a helpful assistant.\n\n" + _prose(rng, 10)
        elif r < 0.08:
            role, tool = "tool", rng.choice(["search", "db", "calc"])
            if rng.random() < 0.7:
                text = ('{"status": "ok", "count": %d, "total": %.2f}'
                        % (rng.randint(0, 99), rng.uniform(1, 999)))
            else:
                text = "ISA*00*A*00*B~GS*HC*X*Y~ST*837*0001~SE*3*0001~"
        elif r < 0.12 and dup_pool:
            role, tool = rng.choice(["user", "assistant"]), ""
            text = rng.choice(dup_pool)          # exact duplicate
        else:
            role, tool = ("user", "") if i % 2 == 0 else ("assistant", "")
            kind = rng.choice(_TURN_KINDS) if rng.random() > 0.02 else "empty"
            text = _turn_text(rng, kind)
            if text.strip() and rng.random() < 0.15:
                dup_pool.append(text)
        ts += timedelta(seconds=rng.randint(5, 600))
        rows.append((conv_id, i, role, text, tool, ts))


def generate_transcripts(out_dir: str, n_turns: int, seed: int = 42,
                         rows_per_file: int = 100_000,
                         mega_convs: int = 2) -> list[str]:
    """Write ``n_turns`` synthetic turns to ``out_dir`` as Parquet files.

    Deterministic for a given (n_turns, seed). A few mega-conversations hold
    ~20-30% of all turns (skew scenario); row order within each file is
    shuffled so pipelines must restore (conv_id, turn_idx) order.
    Returns the list of file paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    rows: list[tuple] = []
    paths: list[str] = []
    conv_i = 0
    file_i = 0

    def flush() -> None:
        nonlocal file_i, rows
        if not rows:
            return
        order = list(range(len(rows)))
        rng.shuffle(order)                      # out-of-order placement
        cols = list(zip(*[rows[i] for i in order]))
        table = pa.table(
            {"conv_id": cols[0], "turn_idx": cols[1], "role": cols[2],
             "text": cols[3], "tool": cols[4], "ts": cols[5]},
            schema=SCHEMA,
        )
        path = os.path.join(out_dir, f"part-{file_i:05d}.parquet")
        # Small row groups so Ray's parquet reader can split one file into
        # many parallel read tasks.
        pq.write_table(table, path, row_group_size=8192)
        paths.append(path)
        file_i += 1
        rows = []

    emitted = 0
    mega_budget = int(n_turns * 0.25)
    if mega_convs and n_turns >= 2000:
        per_mega = mega_budget // mega_convs
        for _ in range(mega_convs):
            _emit_conversation(rng, f"mega-{conv_i:08d}", per_mega, rows)
            conv_i += 1
            emitted += per_mega
            if len(rows) >= rows_per_file:
                flush()

    while emitted < n_turns:
        n = 1 if rng.random() < 0.03 else rng.randint(3, 20)
        n = min(n, n_turns - emitted) or 1
        _emit_conversation(rng, f"conv-{conv_i:08d}", n, rows)
        conv_i += 1
        emitted += n
        if len(rows) >= rows_per_file:
            flush()
    flush()
    return paths


def transcripts_path(n_turns: int, seed: int = 42,
                     base: str = "/tmp/ray_extract_cache") -> str:
    """Cache directory for a generated transcript table; generates once."""
    d = os.path.join(base, f"transcripts_v2_n{n_turns}_s{seed}")
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        generate_transcripts(d, n_turns, seed)
        with open(marker, "w") as f:
            f.write("ok")
    return d
