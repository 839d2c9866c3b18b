"""Make the repo root importable when a study/sweep script runs
standalone (``python scripts/<name>.py`` puts scripts/ first on
sys.path, not the repo). Scripts just ``import _bootstrap``."""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
