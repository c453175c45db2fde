"""Map a FASTQ file against a FASTA reference, writing a TSV of hits.

Usage: python examples/map_fastq.py ref.fa reads.fq out.tsv [--smem]

Demonstrates the production pipeline: persistent checkpointed streaming
(crash-safe; re-run the same command to resume), batched device seeding +
extension, per-batch throughput stats.
"""

import sys

from rust_bio_tpu.io import fasta
from rust_bio_tpu.pipelines import ReadMapper, SmemReadMapper
from rust_bio_tpu.pipelines.stream import StreamingMapper


def main() -> None:
    ref_path, fq_path, out_path = sys.argv[1:4]
    use_smem = "--smem" in sys.argv[4:]
    ref = next(iter(fasta.Reader.from_file(ref_path).records()))
    cls = SmemReadMapper if use_smem else ReadMapper
    mapper = cls(ref.seq)
    sm = StreamingMapper(
        mapper,
        batch_size=4096,
        on_stats=lambda s: print(
            f"batch {s['batch']}: {s['mapped']}/{s['reads']} mapped, "
            f"{s['reads_per_s']:,.0f} reads/s"
        ),
    )
    sm.run(fq_path, out_path, out_path + ".ckpt")
    sm.finalize(out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
