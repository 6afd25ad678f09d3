"""Train on TinyStories — the "Goldilocks" dataset for ~2M-param spectral
models (simple vocabulary + perfect grammar + narrative structure).

Thin front-end over the production trainer with the reference experiment's
defaults.  (reference experiments/train_tinystories.py)

Run: python experiments/train_tinystories.py --data data/tinystories_train.txt
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

if __name__ == "__main__":
    from scripts.train_lm import main

    defaults = ["--seq-len", "512", "--kernel-len", "64", "--d-model", "256",
                "--n-layers", "4", "--batch-size", "8", "--epochs", "20"]
    argv = sys.argv[1:]
    # experiment defaults first; explicit CLI flags win (argparse last-wins)
    sys.argv = [sys.argv[0]] + defaults + argv
    main()
