"""Command-line drivers, installed as console scripts (see pyproject.toml):

- ``uni-adapter-tta``               — `cli.tta`: the 15-corruption TTA
  evaluation driver (reference `main_test-time.py`)
- ``uni-adapter-pretrain``          — `cli.pretrain`: streaming contrastive
  pretraining, data-parallel or pipeline-parallel (``--parallel pp``,
  optionally interleaved; TP composes via the library, parallel/tp.py)
- ``uni-adapter-extract-attention`` — `cli.extract_attention`
- ``uni-adapter-cross-class``       — `cli.cross_class`
- ``uni-adapter-build-anchors``     — `cli.build_anchors`: regenerate a
  precomputed text bank from labels/templates + a text tower
- ``uni-adapter-convert-report``    — `models.loader`: checkpoint
  conversion diff

The repo-root shims (`main.py`, `pretrain.py`, ...) re-export these for
in-tree use; the implementations live here so an installed wheel carries
the full CLI surface.
"""
