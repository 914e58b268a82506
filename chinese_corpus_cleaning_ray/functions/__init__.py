"""Pure per-row / per-batch kernels. No Ray imports here — these are the
semantic core, unit-tested against the oracle restatement in tests/oracle_ref.py."""
