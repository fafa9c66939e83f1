"""Process-unique scratch dir for sink round-trip queries.

Inside the repo (gitignored) and keyed by pid: a concurrently running
test suite / oracle gate / bench must not overwrite each other's sink
outputs mid-read. Shared by every sink operator (advanced.py,
ml_inference.py, multimodal.py) so the location can change in one place.
"""

from __future__ import annotations

import os

SCRATCH_DIR = f"/root/repo/.scratch/pid{os.getpid()}"
