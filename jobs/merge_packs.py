"""Pack-merge job for spark-submit — the reference's merge_cdb
(utils/cdb_utils.py:10-140) as a distributed job over two model packs.

  spark-submit --py-files dist/medcat_spark.zip jobs/merge_packs.py \
      --pack1 /path/pack_a --pack2 /path/pack_b --out /path/merged \
      [--overwrite-training {0,1,2}] [--full-build] [--master local[8]]

Pack-1 is prioritised exactly like cdb1 in the reference (config,
preferred names, addl_info); counts sum and shared CUIs' context
vectors count-weight-average unless --overwrite-training pins one pack.
Prints the merged pack's manifest as one JSON line.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pack1", required=True)
    p.add_argument("--pack2", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--overwrite-training", type=int, default=0,
                   choices=(0, 1, 2))
    p.add_argument("--full-build", action="store_true")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from medcat_spark.model_ops import merge_packs
    from medcat_spark.session import get_spark

    spark = get_spark("merge-packs", master=args.master)
    manifest = merge_packs(spark, args.pack1, args.pack2, args.out,
                           overwrite_training=args.overwrite_training,
                           full_build=args.full_build)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
