"""Native (C++) host-side sampling library, bound via ctypes.

Lazily compiles ``sampler.cpp`` with g++ on first use (build artifacts cached
next to the source); every entry point has a pure-numpy fallback so the
package works even without a toolchain.  See ``sampler.cpp`` for what each
routine replaces in the reference's dependency stack.
"""

from llp_tpu.native.lib import (
    native_available,
    random_walks,
    sample_negative_edges,
    build_csr,
)

__all__ = [
    "native_available",
    "random_walks",
    "sample_negative_edges",
    "build_csr",
]
