"""One-off PCQM4Mv2 preprocessing trigger (reference
examples/generate_PCQM4Mv2.py): featurize the raw CSV+SDF into graph dicts
and cache them as an npz-of-object archive for fast reload.

Example:
  python examples/generate_pcqm4mv2.py --input_data_dir=/data --dataset=PCQM4Mv2
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from config import parse_args

from moleculesde_tpu.data.datasets import load_pcqm4mv2


def main(argv=None):
    args = parse_args(argv)
    root = os.path.join(args.input_data_dir, args.dataset or "PCQM4Mv2")
    graphs = load_pcqm4mv2(root, max_molecules=args.max_molecules or None,
                           extend=args.use_extend_graph)
    processed = os.path.join(root, "processed")
    os.makedirs(processed, exist_ok=True)
    out = os.path.join(processed, "graphs.pkl")
    with open(out, "wb") as f:
        pickle.dump(graphs, f)
    print(f"processed {len(graphs)} molecules -> {out}")


if __name__ == "__main__":
    main()
