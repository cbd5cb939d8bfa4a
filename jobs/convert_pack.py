"""Pack vector-size conversion job for spark-submit — the reference's
convert_vocab_vector_size (utils/vocab_utils.py:93-126) over a pack.

  spark-submit --py-files dist/medcat_spark.zip jobs/convert_pack.py \
      --pack /path/pack --out /path/pack_small --vec-size 100 \
      [--master local[8]]

PCA transformation matrix from a one-pass distributed covariance over
the vocab vectors; vocab AND context vectors are projected executor-side
with the broadcast matrix. Prints the new pack's manifest as one JSON
line.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pack", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--vec-size", type=int, required=True)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from medcat_spark.model_ops import convert_vocab_vector_size
    from medcat_spark.session import get_spark

    spark = get_spark("convert-pack", master=args.master)
    manifest = convert_vocab_vector_size(spark, args.pack, args.out,
                                         args.vec_size)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
