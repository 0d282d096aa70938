"""spark-submit entry point mirroring the reference CLI (main.rs:13-79).

Flag parity:
  -w/--window_size  window size in characters (default 1000, main.rs:28-35)
  -s/--step         step size (sliding windows; tumbling when omitted —
                    generalizes the reference's tumbling-only -w)
  -m/--masked       masked-mode counting (seq_statsu8.rs:50-58)
  -d/--description  include the description column (fw.rs:235-240)
  -c/--ctw          compute CTW bits/base (fw.rs:91-95, expensive)
  -e/--entropy      entropy-only fast mode -> BED output (entropy.rs:86)
  --streaming       consume the input directory as a stream (watermarked
                    event-time aggregation + exactly-once sink)

Usage (local):  python -m fasta_windows_spark.cli -f pages_parquet_dir -o out
Cluster:        spark-submit --py-files fasta_windows_spark.zip \
                    -m fasta_windows_spark.cli -f s3://..../pages -o out
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("fasta_windows_spark")
    p.add_argument("-f", "--input", required=True, help="parquet path (pages/documents schema)")
    p.add_argument("-o", "--output", required=True, help="output name (files under ./fw_out/)")
    p.add_argument("-w", "--window_size", type=int, default=1000)
    p.add_argument("-s", "--step", type=int, default=None)
    p.add_argument("-m", "--masked", action="store_true")
    p.add_argument("-d", "--description", action="store_true")
    p.add_argument("-c", "--ctw", action="store_true")
    p.add_argument("-e", "--entropy", action="store_true")
    p.add_argument("--id-col", default=None, help="id column (default: url or doc_id)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--out-dir", default="./fw_out")
    p.add_argument("--streaming", action="store_true")
    p.add_argument(
        "--salt-buckets",
        type=int,
        default=0,
        help="streaming mode: salt the host-window aggregation across N "
        "state keys per host (hot-host skew; 0 = unsalted)",
    )
    p.add_argument(
        "--format",
        default=None,
        choices=["parquet", "fasta", "warc"],
        help="input format (default: by extension — .fa/.fasta/.fna[.gz] "
        "reads as FASTA, .warc[.gz] as WARC, else parquet)",
    )
    p.add_argument("--master", default=None)
    return p


_FASTA_EXTS = (".fa", ".fasta", ".fna", ".fa.gz", ".fasta.gz", ".fna.gz")


def _input_format(args) -> str:
    if args.format:
        return args.format
    low = args.input.lower()
    if low.endswith(_FASTA_EXTS):
        return "fasta"
    if low.endswith((".warc", ".warc.gz")):
        return "warc"
    return "parquet"


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from .session import get_spark

    if args.streaming and _input_format(args) in ("fasta", "warc"):
        # the streaming path re-reads the input as a parquet pages stream;
        # silently ignoring the format flag would fail confusingly downstream
        print(
            "error: --streaming supports only the parquet pages schema "
            f"({_input_format(args).upper()} input is batch-only; convert "
            "to parquet pages first)",
            file=sys.stderr,
        )
        return 2

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="fasta-windows-spark-cli", master=args.master)
    try:
        if _input_format(args) == "fasta":
            # the reference's native input (fw.rs:46-60): FASTA records as
            # (doc_id=seq_id, description, text=seq)
            from .sources.fasta import fasta_as_documents

            df = fasta_as_documents(spark, args.input)
        elif _input_format(args) == "warc":
            # crawl-native input: WARC responses -> pages (url, text) so the
            # window kernels run on the extracted page text
            from .sources.warc import read_warc, warc_to_pages

            df = warc_to_pages(read_warc(spark, args.input))
        else:
            df = spark.read.parquet(args.input)
        id_col = args.id_col or ("url" if "url" in df.columns else "doc_id")

        if args.streaming:
            from .streaming import pipeline as S

            stream = S.read_pages_stream(spark, args.input)
            if args.salt_buckets > 0:
                agg = S.host_window_stats_salted(
                    stream, salt_buckets=args.salt_buckets
                )
            else:
                agg = S.host_window_stats(stream)
            q = S.write_exactly_once(
                agg,
                f"{args.out_dir}/{args.output}_host_windows",
                f"{args.out_dir}/{args.output}_ckpt",
            )
            q.awaitTermination()
            print(f"[+]\tStreaming output: {args.out_dir}/{args.output}_host_windows")
            return 0

        # Export model (both modes): distributed orderBy(id, start) — the
        # reference's post-channel sort, fw.rs:149-152 — then stream the
        # sorted partitions through toLocalIterator into the TSV writers.
        # Driver memory holds ONE partition at a time, never the whole
        # result (a 100 TB corpus' window table would OOM any collect).
        if args.entropy:
            # fast path: entropy + CTW only (main.rs:90-95, entropy.rs:86-156)
            from .functions.udfs import ctw_udf_frame
            from .sink_tsv import write_entropy_bed

            got = ctw_udf_frame(
                df, text_col=args.text_col, id_cols=[id_col],
                window=args.window_size, step=args.step,
            ).orderBy(id_col, "w_start")
            rows = (
                dict(id=r[id_col], start=r["w_start"], end=r["w_end"],
                     entropy=r["entropy6"], ctw=r["ctw"])
                for r in got.toLocalIterator(prefetchPartitions=True)
            )
            path = write_entropy_bed(rows, args.out_dir, args.output)
            print(f"[+]\tOutput written to: {path}")
            return 0

        from .functions.udfs import window_stats
        from .sink_tsv import spark_rows_to_writer_iter, write_reference_tsvs

        ws = window_stats(
            df,
            text_col=args.text_col,
            id_cols=[id_col],
            window=args.window_size,
            step=args.step,
            masked=args.masked,
            with_ctw=args.ctw,
            with_vectors=True,
            f32=True,
        ).orderBy(id_col, "w_start")
        paths = write_reference_tsvs(
            spark_rows_to_writer_iter(ws), args.out_dir, args.output,
            description=args.description, ctw=args.ctw, presorted=True,
        )
        print(f"[+]\tOutput written to directory: {args.out_dir}")
        for p in paths.values():
            print(f"[+]\t  {p}")
        return 0
    finally:
        if owns_session:  # don't tear down a session we merely joined
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
