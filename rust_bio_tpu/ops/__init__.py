"""Device kernels (the hot compute ops), collected for discoverability.

- ``sw_pallas``: Pallas batch-lockstep SW scoring (global/NW mode).
- The XLA-path kernels live with their subsystems:
  ``alignment.pairwise.batched`` (full SW + traceback),
  ``data_structures.fm_device`` (FM-index search/locate),
  ``pattern_matching.myers_device`` (Myers distances),
  ``stats.pairhmm.device`` (PairHMM forward).
"""
