"""Reference-format TSV export (fixture parity with fasta_windows).

Reproduces the five default-mode writers (main.rs:97-110, fw.rs:229-385)
and the entropy-mode BED writer (entropy.rs:138-148) byte-for-byte:
- headers vary with (description, ctw) exactly as fw.rs:235-240;
- floats print with Rust's {:.3}/{:.6} semantics — round-half-to-even on
  the exact binary value, which Python's format() matches and Java's
  String.format (HALF_UP) does not, so formatting happens at the export
  edge in Python;
- NaN prints as "NaN" (Rust f32::NAN display; 0/0 skews,
  seq_statsu8.rs:110-111);
- rows ordered by (id, start): the reference's post-channel stable sort
  (fw.rs:149-152).

This is the export edge only — Spark keeps full precision in parquet/
Iceberg; at scale these TSVs are written per-partition or per-micro-batch
(foreachBatch) for sample inspection, exactly like the reference's
single-node writers.

Memory model: the writers consume an ITERABLE of row dicts and stream to
disk, so the CLI export path is `orderBy(id, start)` (a distributed
range-partitioned sort) + `toLocalIterator()` (one partition in driver
memory at a time) — never a whole-result `toPandas()` collect. Pass
``presorted=True`` for that path; a plain list is sorted in-process for
small fixtures.
"""

from __future__ import annotations

import math
import os
from contextlib import ExitStack
from typing import Iterable, Iterator

from .kernels import kmer_names

STATS_COLS = [
    "GC_prop",
    "GC_skew",
    "AT_skew",
    "Shannon_entropy",
    "Prop_Gs",
    "Prop_Cs",
    "Prop_As",
    "Prop_Ts",
    "Prop_Ns",
    "Prop_masked",
    "CpG_prop",
    "Dinucleotide_Shannon",
    "Trinucleotide_Shannon",
    "Tetranucleotide_Shannon",
]


def _f(x, digits: int = 3) -> str:
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return "NaN"
    return f"{x:.{digits}f}"


def stats_header(description: bool, ctw: bool) -> str:
    """fw.rs:235-240 header variants."""
    cols = ["ID"]
    if description:
        cols.append("description")
    cols += ["start", "end", "GC_prop", "GC_skew", "AT_skew", "Shannon_entropy"]
    if ctw:
        cols.append("ctw")
    cols += [
        "Prop_Gs", "Prop_Cs", "Prop_As", "Prop_Ts", "Prop_Ns", "Prop_masked",
        "CpG_prop", "Dinucleotide_Shannon", "Trinucleotide_Shannon",
        "Tetranucleotide_Shannon",
    ]
    return "\t".join(cols)


def kmer_header(k: int, description: bool) -> str:
    base = "ID\tdescription\tstart\tend\t" if description else "ID\tstart\tend\t"
    if k == 1:
        return base + "A\tC\tG\tT\tN"  # fw.rs:310
    return base + "\t".join(kmer_names(k))  # fw.rs:312-331


def write_reference_tsvs(
    rows: Iterable[dict],
    out_dir: str,
    output: str,
    description: bool = False,
    ctw: bool = False,
    presorted: bool = False,
) -> dict:
    """Write the 5 default-mode TSVs from per-window row dicts (keys: id,
    desc, start, end, the stat scalars, mono/di/tri/tetra vectors).
    File names per main.rs:93-110.

    All five files are written in ONE streaming pass over `rows`, so a
    lazy iterator (e.g. `toLocalIterator` over a distributed sort) never
    materializes the result set in driver memory. `presorted=False`
    materializes and sorts in-process — for small fixture lists only."""
    os.makedirs(out_dir, exist_ok=True)
    if not presorted:
        rows = sorted(rows, key=lambda r: (r["id"], r["start"]))
    paths = {
        "stats": os.path.join(out_dir, f"{output}_freq_windows.tsv"),
        "mono": os.path.join(out_dir, f"{output}_mononuc_windows.tsv"),
        "di": os.path.join(out_dir, f"{output}_dinuc_windows.tsv"),
        "tri": os.path.join(out_dir, f"{output}_trinuc_windows.tsv"),
        "tetra": os.path.join(out_dir, f"{output}_tetranuc_windows.tsv"),
    }
    kmer_files = (("mono", 1, "mono"), ("di", 2, "di_freq"),
                  ("tri", 3, "tri_freq"), ("tetra", 4, "tetra_freq"))
    with ExitStack() as stack:
        fh = {key: stack.enter_context(open(p, "w")) for key, p in paths.items()}
        fh["stats"].write(stats_header(description, ctw) + "\n")
        for key, k, _ in kmer_files:
            fh[key].write(kmer_header(k, description) + "\n")
        for r in rows:
            prefix = [r["id"]]
            if description:
                prefix.append(r.get("desc") or "No description.")
            prefix += [str(r["start"]), str(r["end"])]
            parts = list(prefix)
            parts += [_f(r["gc_prop"]), _f(r["gc_skew"]), _f(r["at_skew"]),
                      _f(r["shannon_entropy"])]
            if ctw:
                parts.append(_f(r.get("ctw", 0.0)))
            parts += [
                _f(r["prop_g"]), _f(r["prop_c"]), _f(r["prop_a"]),
                _f(r["prop_t"]), _f(r["prop_n"]), _f(r["prop_masked"]),
                _f(r["cpg_prop"]), _f(r["dinuc_shannon"]),
                _f(r["trinuc_shannon"]), _f(r["tetranuc_shannon"]),
            ]
            fh["stats"].write("\t".join(parts) + "\n")
            for key, _, vec_key in kmer_files:
                fh[key].write(
                    "\t".join(prefix + [str(int(v)) for v in r[vec_key]]) + "\n"
                )
    return paths


def write_entropy_bed(rows: Iterable[dict], out_dir: str, output: str) -> str:
    """entropy-mode BED (entropy.rs:138-148): id, start, end, entropy %.6f,
    ctw %.6f, input order preserved (rows must arrive pre-ordered)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{output}_entropy.bed")
    with open(path, "w") as f:
        for r in rows:
            f.write(
                f"{r['id']}\t{r['start']}\t{r['end']}\t"
                f"{_f(r['entropy'], 6)}\t{_f(r['ctw'], 6)}\n"
            )
    return path


def window_mapping_to_row(r, contains) -> dict:
    """One window_stats(+vectors) record (any mapping: pandas Series or
    `Row.asDict()`) -> writer row dict. `contains` tests key presence
    (differs between pandas Series and plain dicts)."""
    if contains("url"):
        rid = r["url"]
    elif contains("doc_id"):
        rid = r["doc_id"]
    else:
        rid = r["id"]
    d = {
        "id": rid,
        "desc": (r["desc"] if contains("desc") else None) or "No description.",
        "start": int(r["w_start"]),
        "end": int(r["w_end"]),
        "gc_prop": r["gc_prop"],
        "gc_skew": r["gc_skew"],
        "at_skew": r["at_skew"],
        "shannon_entropy": r["shannon_entropy"],
        "prop_g": r["prop_g"],
        "prop_c": r["prop_c"],
        "prop_a": r["prop_a"],
        "prop_t": r["prop_t"],
        "prop_n": r["prop_n"],
        "prop_masked": r["prop_masked"],
        "cpg_prop": r["cpg_prop"],
        "dinuc_shannon": r["dinuc_shannon"],
        "trinuc_shannon": r["trinuc_shannon"],
        "tetranuc_shannon": r["tetranuc_shannon"],
        "mono": [r["cnt_a"], r["cnt_c"], r["cnt_g"], r["cnt_t"], r["cnt_n"]],
        "di_freq": list(r["k2_vec"]),
        "tri_freq": list(r["k3_vec"]),
        "tetra_freq": list(r["k4_vec"]),
    }
    if contains("ctw"):
        d["ctw"] = r["ctw"]
    return d


def df_windows_to_rows(pdf) -> list[dict]:
    """Adapter: window_stats(+vectors) pandas frame -> writer row dicts."""
    cols = set(pdf.columns)
    return [
        window_mapping_to_row(r, cols.__contains__) for _, r in pdf.iterrows()
    ]


def spark_rows_to_writer_iter(df) -> Iterator[dict]:
    """Adapter: a SORTED window_stats DataFrame -> lazy writer-dict stream
    via toLocalIterator (one partition in driver memory at a time). The
    DataFrame must already be orderBy(id, w_start)-sorted; the range-
    partitioned sort output is consumed partition-by-partition in order,
    so global order is preserved without a driver-side collect."""
    cols = set(df.columns)
    for row in df.toLocalIterator(prefetchPartitions=True):
        yield window_mapping_to_row(row.asDict(recursive=False), cols.__contains__)
