"""Stratified 80/10/10 dataset split — reference split_dataset.py:13-68.

``python -m ...cli.split_dataset --dataset_folder_name=<root> [--name out]``
copies files into ``{name}_{Train,Val,Test}/<class>/`` with a stratified
sklearn split at seed 42 (the reference's fixed seed, split_dataset.py:13).
"""

from __future__ import annotations

import argparse
import os
import shutil

from ..data.manifest import build_manifest

SEED = 42


def split(root: str, out_base: str = None, train=0.8, val=0.1):
    from sklearn.model_selection import train_test_split

    m = build_manifest(root)
    out_base = out_base or root.rstrip("/")
    paths = [s.image_path for s in m.samples]
    labels = [s.label for s in m.samples]
    tr_p, rest_p, tr_y, rest_y = train_test_split(
        paths, labels, train_size=train, stratify=labels, random_state=SEED)
    rel_val = val / (1.0 - train)
    va_p, te_p, va_y, te_y = train_test_split(
        rest_p, rest_y, train_size=rel_val, stratify=rest_y, random_state=SEED)
    for split_name, ps in (("Train", tr_p), ("Val", va_p), ("Test", te_p)):
        for p in ps:
            cls = os.path.basename(os.path.dirname(p))
            d = f"{out_base}_{split_name}/{cls}"
            os.makedirs(d, exist_ok=True)
            shutil.copy2(p, os.path.join(d, os.path.basename(p)))
        print(f"{split_name}: {len(ps)} files")
    return out_base


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_folder_name", required=True)
    p.add_argument("--name", default=None)
    a = p.parse_args(argv)
    split(a.dataset_folder_name, a.name)


if __name__ == "__main__":
    main()
