"""Supervised model-training job for spark-submit.

  spark-submit --py-files dist/medcat_spark.zip jobs/train_model.py \
      --mct /path/export.json --model-pack /path/pack \
      --out-pack /path/pack_trained [--master local[8]]

Reads a MedCATtrainer export (S7), runs the distributed supervised
trainer (count-weighted mean combine — see model_ops docstring for the
documented divergence from the reference's sequential anneal), applies
killed-annotation unlinks, and writes an updated model pack.
"""

from __future__ import annotations

import argparse
import json
import sys


def _train_meta_head(spark, args, cfg):
    """--train-meta: distributed window prep over the MCT export, numpy
    BPTT on the driver (reference meta_cat.py:200-358 semantics), the
    trained head written as meta_<CATEGORY>/ inside the out pack (both
    MedCAT-layout and columnar packs load it back — run_kg --meta)."""
    import os

    from medcat_spark.functions.lstm_train import (
        collect_samples, init_lstm_meta, mct_meta_samples, train_lstm_meta,
        train_lstm_meta_two_phase)
    from medcat_spark.sources.model_pack import is_reference_pack
    from medcat_spark.sources.reference_pack import (
        load_component_dirs, write_reference_meta_component)

    from medcat_spark.functions.lstm_meta import LstmMetaModel

    category = args.train_meta
    model = None
    if os.path.isdir(args.model_pack):
        comps = load_component_dirs(args.model_pack)
        model = comps.get(category)
    from medcat_spark.functions.bert_np import BertMetaModel
    if model is not None and not isinstance(model, (LstmMetaModel,
                                                    BertMetaModel)):
        raise ValueError(
            f"meta_{category} is a {type(model).__name__}; in-engine "
            "training supports the LSTM and BERT meta heads")
    if model is not None and getattr(model, "tokenizer", None) is None:
        raise ValueError(
            f"meta_{category} loaded without a tokenizer — cannot rebuild "
            "training windows; add the component's bbpe-*/vocab files")
    if model is None:
        # fresh head: BBPE tokenizer trained on the export's documents
        from pyspark.sql import functions as F

        from medcat_spark.core.bbpe import train_bbpe
        raw = spark.read.option("multiLine", "true").json(args.mct)
        texts = [r[0] for r in
                 (raw.select(F.explode("projects").alias("p"))
                  .select(F.explode("p.documents").alias("d"))
                  .select(F.col("d.text")).collect())]
        tokenizer = train_bbpe(texts, vocab_size=5000)
        labels = None      # discovered from the data below
    else:
        tokenizer = model.tokenizer
        labels = model.labels
    samples_df = mct_meta_samples(
        spark, args.mct, category, tokenizer,
        cntx_left=model.cntx_left if model else 15,
        cntx_right=model.cntx_right if model else 10)
    label2id = ({v: i for i, v in enumerate(labels)} if labels else None)
    data, label2id = collect_samples(samples_df, label2id)
    if not data:
        raise ValueError(f"no training windows for meta task {category!r} "
                         "in the export")
    if model is None:
        labels = [v for v, _ in sorted(label2id.items(),
                                       key=lambda kv: kv[1])]
        model = init_lstm_meta(labels, tokenizer.vocab,
                               input_size=300, hidden_size=300,
                               tokenizer=tokenizer)
    if isinstance(model, BertMetaModel):
        from medcat_spark.functions.bert_train import train_bert_meta
        report = train_bert_meta(model, data, nepochs=args.meta_epochs,
                                 lr=args.meta_lr)
    elif getattr(args, "meta_distributed", False):
        # data-parallel gradient shards across executors; combined
        # gradient == the sequential full-batch gradient (exact), so
        # this path needs the large-macro-batch regime to pay off
        from medcat_spark.functions.lstm_train import \
            train_lstm_meta_spark
        report = train_lstm_meta_spark(
            spark, model, data,
            n_shards=getattr(args, "meta_shards", 8),
            nepochs=args.meta_epochs, lr=args.meta_lr,
            batch_size=max(1000, args.meta_shards * 250))
    elif args.meta_two_phase:
        report = train_lstm_meta_two_phase(
            model, data, nepochs=args.meta_epochs, lr=args.meta_lr)
    else:
        report = train_lstm_meta(model, data, nepochs=args.meta_epochs,
                                 lr=args.meta_lr)
    out_dir = os.path.join(args.out_pack, f"meta_{category}")
    write_reference_meta_component(out_dir, model, category)
    return {"category": category, "n_samples": len(data),
            "out": out_dir, "report": report,
            "pack_layout": ("reference" if is_reference_pack(args.out_pack)
                            else "columnar")}


def _train_rel_head(spark, args):
    """--train-relations: fine-tune the pack's rel_<NAME> BERT component
    on the MCT export's relations records (numpy backprop, reference
    RelCAT.train loop), written back as rel_<NAME>/ in the out pack."""
    import os

    from medcat_spark.functions.bert_np import RelCatBertModel
    from medcat_spark.functions.bert_train import (
        collect_relation_samples, mct_relation_samples, train_relcat)
    from medcat_spark.sources.reference_pack import (
        load_component_dirs, write_reference_rel_component)

    name = args.train_relations
    comps = (load_component_dirs(args.model_pack)
             if os.path.isdir(args.model_pack) else {"_skipped": []})
    model = comps.get(f"rel_{name}")
    if model is None:
        raise ValueError(
            f"model pack has no loadable rel_{name} component — relation "
            "fine-tuning starts from an existing RelCAT checkpoint "
            "(skipped: %s)" % comps.get("_skipped"))
    if not isinstance(model, RelCatBertModel):
        raise ValueError(
            f"rel_{name} is a {type(model).__name__}; in-engine training "
            "supports the BERT backbone (LLaMA/ModernBERT rel heads "
            "still need torch to fine-tune)")
    df = mct_relation_samples(spark, args.mct, model,
                              other_sample_per_doc=args.rel_other_per_doc)
    data, labels = collect_relation_samples(df, labels=model.labels)
    if not data:
        raise ValueError("no relation training samples in the export")
    if getattr(args, "rel_distributed", False):
        from medcat_spark.functions.bert_train import train_relcat_spark
        report = train_relcat_spark(
            spark, model, data,
            n_shards=getattr(args, "meta_shards", 8),
            nepochs=args.rel_epochs, lr=args.rel_lr,
            batch_size=max(500, getattr(args, "meta_shards", 8) * 125))
    else:
        report = train_relcat(model, data, nepochs=args.rel_epochs,
                              lr=args.rel_lr)
    out_dir = os.path.join(args.out_pack, f"rel_{name}")
    n_heads = getattr(model.encoder, "n_heads", 8)
    write_reference_rel_component(out_dir, model, n_heads=n_heads)
    return {"name": name, "n_samples": len(data), "labels": labels,
            "out": out_dir, "report": report}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mct", required=True)
    p.add_argument("--model-pack", required=True)
    p.add_argument("--out-pack", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--devalue-others", action="store_true",
                   help="negative-train other CUIs sharing a gold name "
                        "(reference cat.py:790-800)")
    p.add_argument("--no-add-names", action="store_true",
                   help="skip adding gold (cui, value) names to the CDB "
                        "(reference add_and_train_concept adds by default)")
    p.add_argument("--train-from-fp", action="store_true",
                   help="negative-train predicted annotations absent from "
                        "the gold set (reference cat.py:1061-1070)")
    p.add_argument("--train-meta", metavar="CATEGORY", default=None,
                   help="also train the meta head for this MCT meta-"
                        "annotation task (e.g. Negation): fine-tunes the "
                        "pack's meta_<CATEGORY> component if present, "
                        "else initializes one (BBPE tokenizer trained on "
                        "the export's documents); reference "
                        "meta_cat.py:200-358 train loop in numpy")
    p.add_argument("--meta-epochs", type=int, default=50)
    p.add_argument("--meta-lr", type=float, default=1e-3)
    p.add_argument("--meta-distributed", action="store_true",
                   help="compute each macro-batch gradient data-parallel "
                        "across executors (exact: equals the sequential "
                        "full-batch gradient)")
    p.add_argument("--meta-shards", type=int, default=8)
    p.add_argument("--meta-two-phase", action="store_true",
                   help="phase 1 on the class-undersampled set, phase 2 "
                        "on the full set (meta_cat.py:274-301)")
    p.add_argument("--train-relations", metavar="NAME", default=None,
                   help="fine-tune the pack's rel_<NAME> RelCAT BERT "
                        "component on the export's relations records "
                        "(full numpy backprop; reference "
                        "rel_cat.py:174-420 loop)")
    p.add_argument("--rel-epochs", type=int, default=10)
    p.add_argument("--rel-lr", type=float, default=1e-4)
    p.add_argument("--rel-distributed", action="store_true",
                   help="data-parallel macro-batch gradients for the "
                        "relation head (exact combine; shares "
                        "--meta-shards)")
    p.add_argument("--rel-other-per-doc", type=int, default=0,
                   help="sample up to N 'Other' pairs per document from "
                        "validated annotations (rel_dataset.py:516-559)")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from medcat_spark.model_ops import (add_gold_concepts, save_trained_pack,
                                        train_supervised_spark)
    from medcat_spark.pipeline import broadcast_model
    from medcat_spark.session import get_spark
    from medcat_spark.sources.mct_export import (documents_from_mct,
                                                 read_mct_export)
    from medcat_spark.sources.model_pack import load_any_pack

    spark = get_spark("medcat-spark-train", master=args.master)
    cdb, vocab, cfg = load_any_pack(args.model_pack)
    mct = read_mct_export(spark, args.mct).cache()

    # killed annotations unlink the name from the concept (cat.py:693-728)
    from medcat_spark.core.model import prepare_name
    killed = (mct.where(F.col("killed"))
              .select("cui", "value").distinct().collect())
    for r in killed:
        for name in prepare_name(r["value"], cfg):
            cdb.unlink_name(r["cui"], name)

    # gold names join the dictionary BEFORE training, like the
    # reference's per-annotation add_and_train_concept (cat.py:730-785)
    names_added = 0 if args.no_add_names else add_gold_concepts(cdb, mct, cfg)

    # positives/negatives per the reference training loop
    # (cat.py:1046-1059): every non-killed annotation trains — deleted
    # (annotator-rejected) ones NEGATIVELY; `validated` is not a train
    # gate there (it gates stats only, stats/stats.py)
    ann_cols = ["doc_id", F.col("start").cast("int").alias("start"),
                F.col("end").cast("int").alias("end"), "cui", "value"]
    gold = (mct.where(~F.col("killed") & ~F.col("deleted"))
            .select(*ann_cols))
    neg_gold = (mct.where(~F.col("killed") & F.col("deleted"))
                .select(*ann_cols))
    docs = documents_from_mct(mct)
    bc = broadcast_model(spark, cdb, vocab, cfg)
    # distributed pack write: mean context vectors go straight from the
    # trainer DataFrame into the pack's context_vectors.parquet — no
    # driver collect of vectors (VERDICT r01 finding #3)
    trained = train_supervised_spark(spark, gold, docs, bc, cfg,
                                     devalue_others=args.devalue_others,
                                     train_from_fp=args.train_from_fp,
                                     negative_gold=neg_gold)
    manifest = save_trained_pack(spark, args.out_pack, cdb, vocab,
                                 trained, cfg)
    meta_report = None
    if args.train_meta:
        meta_report = _train_meta_head(spark, args, cfg)
    rel_report = None
    if args.train_relations:
        rel_report = _train_rel_head(spark, args)
    print(json.dumps({"examples": int(gold.count()),
                      "negative_examples": int(neg_gold.count()),
                      "killed_unlinked": len(killed),
                      "gold_names_added": names_added,
                      **({"meta": meta_report} if meta_report else {}),
                      **({"relations": rel_report} if rel_report else {}),
                      **manifest}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
