"""Export a native columnar model pack in MedCAT's own pack layout
(the inverse of the r4 import path): JSON-split CDB + plain-pickled
cdb.dat/vocab.dat (dill-readable) + config.json [+ zip].

Usage:
  spark-submit --py-files dist/medcat_spark.zip jobs/export_pack.py \
      --model-pack /models/native_pack --out /models/medcat_pack [--zip]

Driver-side only (the pack is model-sized by definition); no Spark
session is started.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--model-pack", required=True,
                   help="native columnar pack directory")
    p.add_argument("--out", required=True,
                   help="output directory (reference layout)")
    p.add_argument("--zip", action="store_true")
    args = p.parse_args(argv)

    from medcat_spark.sources.model_pack import load_model_pack
    from medcat_spark.sources.reference_pack import (
        write_reference_layout_pack)

    cdb, vocab, cfg = load_model_pack(args.model_pack)
    out = write_reference_layout_pack(args.out, cdb, vocab, cfg,
                                      as_zip=args.zip)
    print(json.dumps({"out": out,
                      "n_concepts": len(cdb.cui2names),
                      "n_names": len(cdb.name2cuis),
                      "n_vocab_words": len(vocab.word2cnt)}))


if __name__ == "__main__":
    main(sys.argv[1:])
