"""One-off PCQM4Mv2 preprocessing trigger (reference
examples/generate_PCQM4Mv2.py): featurize the raw CSV+SDF into the packed
flat-array cache (data/packed.py) that every consumer reloads memory-mapped
in seconds — the TPU equivalent of the reference's collated
``geometric_data_processed.pt`` blob (dataset_PCQM4Mv2.py:45-77).

Example:
  python examples/generate_pcqm4mv2.py --input_data_dir=/data --dataset=PCQM4Mv2
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from config import parse_args

from moleculesde_tpu.data.datasets import load_pcqm4mv2


def main(argv=None):
    args = parse_args(argv)
    root = os.path.join(args.input_data_dir, args.dataset or "PCQM4Mv2")
    graphs = load_pcqm4mv2(root, max_molecules=args.max_molecules or None,
                           extend=args.use_extend_graph)
    size_gb = graphs.nbytes() / 1e9
    print(f"processed {len(graphs)} molecules into the packed cache under "
          f"{root} ({size_gb:.2f} GB of flat arrays, memory-mapped on reload)")


if __name__ == "__main__":
    main()
