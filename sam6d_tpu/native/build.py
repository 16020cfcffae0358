"""python -m sam6d_tpu.native.build — prebuild the native kernels."""
from . import build

if __name__ == "__main__":
    so = build(force=True)
    print(so or "no C compiler found; pure-Python fallback will be used")
