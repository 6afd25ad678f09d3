"""Build the native host library: python -m spectral_tpu.native.build"""

from spectral_tpu.native import build, _LIB

if __name__ == "__main__":
    ok = build(force=True)
    print(f"{'built' if ok else 'FAILED to build'} {_LIB}")
