"""Generate an adversarial documents fixture that stresses every
Spark(Java)-vs-DuckDB(RE2/utf8proc) text-semantics divergence the oracle
gate could hit: non-ASCII whitespace, vertical tab, Unicode case special
cases, combining marks, non-BMP codepoints, empty/whitespace-only docs.

The fixture dir mirrors /root/testdata/sf0.001 (all other tables are
copied verbatim) with documents.parquet replaced. Deterministic: no RNG.

Usage: python scripts/make_adversarial_fixture.py [out_dir]
(default /tmp/advfix)
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.001")

# Every adversarial text rides through the SAME pipeline as plain rows.
ADVERSARIAL_TEXTS = [
    # vertical tab: Java \s matches \x0B, RE2 \s does not
    "alpha\x0bbeta gamma",
    # form feed both match; bare CR; CRLF
    "alpha\fbeta\rgamma\r\ndelta",
    # NBSP U+00A0: not \s in either ASCII mode, IS \s in Unicode mode
    "alpha beta gamma",
    # Unicode line/para separators + ideographic space + thin space
    "alpha beta gamma　delta eps",
    # zero-width space / BOM / word joiner
    "alpha​beta﻿gamma⁠delta",
    # Turkish dotted/dotless I: Java lower('İ') = 'i̇' (2 cp),
    # utf8proc simple lower = 'i' (1 cp)
    "İstanbul Iık ISPARTA",
    # Greek sigma: Java full casing maps final sigma context-sensitively
    "Σοφός ΣΑΣ Σ",
    # German sharp s: upper ẞ U+1E9E lowers to ß
    "STRAẞE straße GROSS",
    # combining marks: e + U+0301 vs precomposed é (NFC/NFD sensitivity)
    "café café résumé",
    # non-BMP: emoji + math letters (substr/length codepoint vs UTF-16)
    "\U0001f600 grin \U0001f9ea lab \U0001d49e math",
    # ASCII control chars (not whitespace): SOH, BEL, DEL
    "a\x01b\x07c\x7fd",
    # empty / whitespace-only variants
    "",
    " ",
    "\t",
    "\x0b",
    " ",
    "\n\n\n",
    " \t\r\n\f ",
    # leading/trailing whitespace mixes (trim + split edge order)
    "  lead",
    "trail  ",
    "\tlead-tab",
    "trail-tab\t",
    # repeated lines for dedup_lines / curate paths, with unicode
    "line one\nline one\nline über\nline über\nlast",
    # PII-shaped tokens with unicode around them
    "mail jöe@exämple.com tel 555-123-4567 ssn 123-45-6789",
    # mixed-case ASCII (control group: must stay green)
    "The Quick BROWN fox JUMPS over the lazy DOG",
    # very long repeated token run (CDC chunk boundaries on unicode)
    ("élán " * 40).strip(),
    # lone surrogates can't exist in valid UTF-8; closest: replacement char
    "rep�lacement",
    # tab-separated tokens only
    "a\tb\tc",
    # Cyrillic + CJK (multi-byte, no case for CJK)
    "Привет 世界 こん",
    # Latin-1 supplement casing
    "ÀÈÌÒÙ àèìòù",
]

LANGS = ["es", "zh", "de", "en", "fr"]
SOURCES = ["src0", "src1", "src2"]


def build_documents() -> pa.Table:
    base = pq.read_table(SRC / "documents.parquet").to_pandas()
    rows = []
    next_id = int(base["doc_id"].max()) + 1
    # interleave adversarial rows among real ones so every groupBy /
    # window / stratum mixes both populations
    for i, txt in enumerate(ADVERSARIAL_TEXTS):
        rows.append(
            {
                "doc_id": next_id + i,
                "text": txt,
                "lang": LANGS[i % len(LANGS)],
                "source": SOURCES[i % len(SOURCES)],
                "n_chars": len(txt),
            }
        )
    # exact-duplicate pair of a unicode row (dedup paths must agree)
    rows.append(
        {
            "doc_id": next_id + len(ADVERSARIAL_TEXTS),
            "text": ADVERSARIAL_TEXTS[5],
            "lang": "en",
            "source": "src0",
            "n_chars": len(ADVERSARIAL_TEXTS[5]),
        }
    )
    import pandas as pd

    out = pd.concat([base, pd.DataFrame(rows)], ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def main() -> None:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/advfix")
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in SRC.glob("*.parquet"):
        if p.name != "documents.parquet":
            shutil.copy(p, out_dir / p.name)
    pq.write_table(build_documents(), out_dir / "documents.parquet")
    print(f"wrote {out_dir} ({len(ADVERSARIAL_TEXTS) + 1} adversarial docs)")


if __name__ == "__main__":
    main()
