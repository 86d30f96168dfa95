"""Historical entry point — the scale harness was promoted to
/root/repo/bench_scale.py in r10 (r9 verdict task #5), with its
normalization arithmetic in kinesis_writer_spark/scalebench.py
(unit-tested in tests/test_scalebench.py). This shim keeps the r6-r9
artifact commands (`python artifacts/bench_sf1_spot.py ...`) working;
see bench_scale.py for the fixture methodology docstring."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scale import SPOT, build_fixture, build_sf1, main  # noqa: F401

if __name__ == "__main__":
    main()
