"""List root-level python entry points (reference tools/list_root_py.py)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import pathlib

for p in sorted(pathlib.Path(__file__).parent.parent.glob("*.py")):
    print(p.name)
