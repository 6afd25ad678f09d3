"""Quick import smoke check (reference tools/check_import.py)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import spectral_tpu

print("spectral_tpu", spectral_tpu.__version__, "imports OK")
