"""Real-data manifest + fetch/verify runner for the Sub-GC artifacts.

The reference's data distribution is a Google Drive folder
(`/root/reference/DATA.md:3`): per-image scene-graph `.npz` trees, talk
json/h5 label files, GloVe embeddings, rerank features/annotations, the
grounding class file, and five pretrained checkpoints.  This tool owns the
day-one path on a networked machine:

    python tools/fetch_data.py --check            # what's present / missing
    python tools/fetch_data.py --fetch            # download what's missing
    python tools/fetch_data.py --record-checksums # pin sha256 after 1st fetch
    python tools/fetch_data.py --verify           # re-check against the pins

Every stage after the download itself is rehearsed offline (synthetic
stand-ins, docs/REPRODUCE_DRILL.md); see docs/REALDATA.md for the full
fetch -> convert -> parity -> reproduce sequence.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

GDRIVE_FOLDER = "1mCx8R8d36ZpUSoVZKExs0FDA_IXiAiZA"   # DATA.md:3
GDRIVE_URL = ("https://drive.google.com/drive/folders/"
              f"{GDRIVE_FOLDER}?usp=sharing")
CORENLP_URL = "https://stanfordnlp.github.io/CoreNLP/history.html"

# One entry per artifact in DATA.md's folder layout.  kind:
#   npz_tree  — directory of per-image .npz files (count = expected images)
#   file      — single file
# approx_mb are from DATA.md's description (the SG trees dominate the
# ~100GB total); unknown exact sizes stay None and get pinned by
# --record-checksums after the first fetch.
MANIFEST = [
    # -- scene-graph exports (L0 output; dataloader input) ----------------
    dict(path="data/COCO_sg_output_64", kind="npz_tree", count=123287,
         approx_mb=60000, needed_for=["Sub_GC_MRNN", "Sub_GC_Kar",
                                      "Full_GC_Kar"],
         note="merge *_part1/2/3 zips into one folder (DATA.md:3)"),
    dict(path="data/COCO_graph_mask_1000_rm_duplicate", kind="npz_tree",
         count=123287, approx_mb=20000,
         needed_for=["Sub_GC_MRNN", "Sub_GC_Kar"]),
    dict(path="data/flickr30k_sg_output_64", kind="npz_tree", count=31783,
         approx_mb=15000, needed_for=["Sub_GC_Flickr", "Sub_GC_Sup_Flickr"]),
    dict(path="data/flickr30k_graph_mask_1000_rm_duplicate", kind="npz_tree",
         count=31783, approx_mb=5000, needed_for=["Sub_GC_Flickr"]),
    dict(path="data/flickr30k_gt_graph_mask", kind="npz_tree", count=31783,
         approx_mb=2000, needed_for=["Sub_GC_Sup_Flickr",
                                     "Sub_GC_Flickr_CTL"]),
    # -- vocab / label packs ----------------------------------------------
    dict(path="data/cocotalk.json", kind="file", approx_mb=30,
         needed_for=["Sub_GC_MRNN", "Sub_GC_Kar", "Full_GC_Kar"]),
    dict(path="data/cocotalk_label.h5", kind="file", approx_mb=150,
         needed_for=["Sub_GC_MRNN", "Sub_GC_Kar", "Full_GC_Kar"]),
    dict(path="data/flickr30ktalk.json", kind="file", approx_mb=10,
         needed_for=["Sub_GC_Flickr", "Sub_GC_Sup_Flickr"]),
    dict(path="data/flickr30ktalk_label.h5", kind="file", approx_mb=40,
         needed_for=["Sub_GC_Flickr", "Sub_GC_Sup_Flickr"]),
    dict(path="data/flickr30k_img_wh.npy", kind="file", approx_mb=1,
         needed_for=["Sub_GC_Flickr_CTL", "Sub_GC_Sup_Flickr_CTL"]),
    dict(path="data/glove.6B.300d.pt", kind="file", approx_mb=800,
         needed_for=["all (word embeddings at model init)"]),
    dict(path="data/gvd_all_dict.npy", kind="file", approx_mb=5,
         needed_for=["Sub_GC_Flickr_GRD"]),
    dict(path="data/sct_dict_test_grouped_gt_box.npy", kind="file",
         approx_mb=20, needed_for=["Sub_GC_Flickr_CTL",
                                   "Sub_GC_Sup_Flickr_CTL"]),
    # -- rerank / grounding side data --------------------------------------
    dict(path="misc/consensus_reranking/image_features_mRNN/"
              "res_feat_101_dct_mscoco_2014.npy", kind="file", approx_mb=1000,
         needed_for=["rerank (COCO)"]),
    dict(path="misc/consensus_reranking/image_features_mRNN/"
              "res_feat_101_dct_flickr30k.npy", kind="file", approx_mb=250,
         needed_for=["rerank (Flickr)"]),
    dict(path="misc/consensus_reranking/mscoco_anno_files/"
              "anno_list_mscoco_trainModelVal_m_RNN.npy", kind="file",
         approx_mb=100, needed_for=["rerank (M-RNN split)"]),
    dict(path="misc/consensus_reranking/mscoco_anno_files/"
              "karpathy_train_val_anno_list.npy", kind="file", approx_mb=100,
         needed_for=["rerank (Karpathy split)"]),
    dict(path="misc/consensus_reranking/mscoco_anno_files/"
              "flickr30k_karpathy_train_val_anno_list.npy", kind="file",
         approx_mb=30, needed_for=["rerank (Flickr)"]),
    dict(path="misc/grounding/flickr30k_cleaned_class.json", kind="file",
         approx_mb=1, needed_for=["Sub_GC_Flickr_GRD"]),
    # -- pretrained checkpoints (parity targets) ---------------------------
    dict(path="pretrained/sub_gc_MRNN/model-60000.pth", kind="file",
         approx_mb=150, needed_for=["Sub_GC_MRNN parity (Table 2)"]),
    dict(path="pretrained/sub_gc_MRNN/infos_topdown-60000.pkl", kind="file",
         approx_mb=5, needed_for=["Sub_GC_MRNN parity"]),
    dict(path="pretrained/sub_gc_karpathy/model-60000.pth", kind="file",
         approx_mb=150, needed_for=["Sub_GC_Kar parity (Table 3)"]),
    dict(path="pretrained/sub_gc_karpathy/infos_topdown-60000.pkl",
         kind="file", approx_mb=5, needed_for=["Sub_GC_Kar parity"]),
    dict(path="pretrained/full_gc/model-33000.pth", kind="file",
         approx_mb=150, needed_for=["Full_GC_Kar parity (Table 3)"]),
    dict(path="pretrained/full_gc/infos_topdown-33000.pkl", kind="file",
         approx_mb=5, needed_for=["Full_GC_Kar parity"]),
    dict(path="pretrained/sub_gc_flickr/model-16000.pth", kind="file",
         approx_mb=150, needed_for=["Sub_GC_Flickr parity (Tables 4-5)"]),
    dict(path="pretrained/sub_gc_flickr/infos_topdown-16000.pkl",
         kind="file", approx_mb=5, needed_for=["Sub_GC_Flickr parity"]),
    dict(path="pretrained/sub_gc_sup_flickr/model-16000.pth", kind="file",
         approx_mb=150, needed_for=["Sub_GC_Sup_Flickr parity (Table 5)"]),
    dict(path="pretrained/sub_gc_sup_flickr/infos_topdown-16000.pkl",
         kind="file", approx_mb=5, needed_for=["Sub_GC_Sup_Flickr parity"]),
]

CHECKSUM_FILE = "tools/data_checksums.json"


def _status(root, entry):
    p = os.path.join(root, entry["path"])
    if entry["kind"] == "npz_tree":
        if not os.path.isdir(p):
            return "missing", 0
        n = sum(1 for f in os.listdir(p) if f.endswith(".npz"))
        if n == 0:
            return "empty", 0
        if entry.get("count") and n < entry["count"]:
            return f"partial ({n}/{entry['count']} npz)", n
        return "ok", n
    if not os.path.isfile(p):
        return "missing", 0
    return "ok", os.path.getsize(p)


def cmd_check(root):
    missing = []
    total_mb = 0
    for e in MANIFEST:
        st, _ = _status(root, e)
        mark = "OK " if st == "ok" else "-- "
        if st != "ok":
            missing.append(e)
            total_mb += e.get("approx_mb") or 0
        print(f"{mark}{st:28s} {e['path']}")
    if missing:
        print(f"\n{len(missing)}/{len(MANIFEST)} artifacts missing "
              f"(~{total_mb / 1000:.0f} GB).  Source: {GDRIVE_URL}")
        print("Run `python tools/fetch_data.py --fetch` on a networked "
              "machine, or download manually and re-run --check.")
        return 1
    print(f"\nall {len(MANIFEST)} artifacts present.")
    return 0


def _sha256(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def cmd_record(root):
    """Pin sha256 of every present FILE artifact (npz trees pin their file
    count + total bytes — hashing 123k files is not useful)."""
    out = {}
    for e in MANIFEST:
        p = os.path.join(root, e["path"])
        st, n = _status(root, e)
        if st != "ok":
            continue
        if e["kind"] == "file":
            out[e["path"]] = {"sha256": _sha256(p), "bytes": n}
        else:
            total = sum(os.path.getsize(os.path.join(p, f))
                        for f in os.listdir(p) if f.endswith(".npz"))
            out[e["path"]] = {"npz_count": n, "bytes": total}
        print(f"pinned {e['path']}")
    with open(CHECKSUM_FILE, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {CHECKSUM_FILE} ({len(out)} entries)")
    return 0


def cmd_verify(root):
    if not os.path.isfile(CHECKSUM_FILE):
        print(f"no {CHECKSUM_FILE} — run --record-checksums after the "
              "first fetch to pin, then --verify on later machines")
        return 1
    pins = json.load(open(CHECKSUM_FILE))
    bad = 0
    for path, pin in pins.items():
        p = os.path.join(root, path)
        if "sha256" in pin:
            if not os.path.isfile(p):
                print(f"MISSING {path}")
                bad += 1
                continue
            got = _sha256(p)
            if got != pin["sha256"]:
                print(f"CHECKSUM MISMATCH {path}")
                bad += 1
        else:
            names = ([f for f in os.listdir(p) if f.endswith(".npz")]
                     if os.path.isdir(p) else [])
            n = len(names)
            if n != pin["npz_count"]:
                print(f"NPZ COUNT MISMATCH {path}: {n} != {pin['npz_count']}")
                bad += 1
                continue
            total = sum(os.path.getsize(os.path.join(p, f)) for f in names)
            if "bytes" in pin and total != pin["bytes"]:
                print(f"NPZ BYTES MISMATCH {path}: {total} != {pin['bytes']}")
                bad += 1
    print(f"{len(pins) - bad}/{len(pins)} verified ok")
    return 1 if bad else 0


def cmd_fetch(root):
    """Resumable download of missing artifacts.

    Google Drive folders need the `gdown` tool (not baked into this image);
    if it is importable the folder is pulled directly, otherwise exact
    manual instructions are printed.  Already-present artifacts are skipped,
    so re-running resumes after an interrupted download."""
    missing = [e for e in MANIFEST if _status(root, e)[0] != "ok"]
    if not missing:
        print("nothing to fetch — all artifacts present")
        return 0
    try:
        import gdown  # noqa: F401
    except ImportError:
        print("`gdown` is not installed — manual path:")
        print(f"  1. open {GDRIVE_URL}")
        print("  2. download the zips; unzip; merge *_part1/2/3 folders")
        print(f"  3. place under {os.path.abspath(root)} per DATA.md layout")
        print("  4. re-run --check, then --record-checksums")
        print("Also: SPICE jars via misc/coco-caption/get_stanford_models.sh"
              f" and CoreNLP 3.9.1 from {CORENLP_URL} (reference's grounding"
              " stack only — this repo's eval/ runs without Java).")
        print("\nMissing:")
        for e in missing:
            print(f"  {e['path']}  (~{e.get('approx_mb', '?')} MB; needed "
                  f"for {', '.join(e['needed_for'])})")
        return 1
    import gdown
    os.makedirs(root, exist_ok=True)
    gdown.download_folder(id=GDRIVE_FOLDER, output=root, quiet=False,
                          use_cookies=False)
    print("fetch done — now merge *_part folders per DATA.md, then "
          "re-run --check")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--root", default=".",
                    help="repo/data root (default: cwd)")
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--check", action="store_true")
    g.add_argument("--fetch", action="store_true")
    g.add_argument("--record-checksums", action="store_true")
    g.add_argument("--verify", action="store_true")
    args = ap.parse_args(argv)
    if args.check:
        return cmd_check(args.root)
    if args.fetch:
        return cmd_fetch(args.root)
    if args.record_checksums:
        return cmd_record(args.root)
    return cmd_verify(args.root)


if __name__ == "__main__":
    sys.exit(main())
