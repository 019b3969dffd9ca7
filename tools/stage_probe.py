"""Per-stage scaling diagnostic: times scan / clean / narrow / full at
one parallelism level.  Usage: [taskset ...] python tools/stage_probe.py <cores> [corpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/.bench_cache/transcripts_sf0.1_x20.parquet"

    from pyspark.sql import functions as F
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.session import get_spark
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.extract import extract_turns
    from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.sessionize import assign_visits

    spark = get_spark(f"stp{cores}", master=f"local[{cores}]",
                      shuffle_partitions=4 * cores)
    t = spark.read.parquet(corpus)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    jobs = {
        "scan": lambda: noop(t.select("conv_id", "turn_idx", F.length("text").alias("l"))),
        "clean_arrow": lambda: noop(
            extract_turns(t, with_sections=False).select("conv_id", "turn_idx", "text_clean")),
        "narrow_full": lambda: noop(extract_turns(t, with_sections=True)),
        "full": lambda: noop(assign_visits(extract_turns(t, with_sections=True))),
    }
    out = {"cores": cores}
    for name, job in jobs.items():
        for _ in range(2):
            job()
        times = []
        for _ in range(2):
            t0 = time.time(); job(); times.append(time.time() - t0)
        out[name] = round(min(times), 2)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
