#!/bin/bash
# Full test suite in TWO pytest processes.
#
# Why not one: the XLA:CPU in-process compiler crashes (segfault in
# backend_compile_and_load / silent death) after ~160 tests' worth of
# accumulated compiles in a single process — reproduced twice at the same
# position on 2026-08-18, while every module passes standalone. Neither
# disabling the persistent compilation cache nor jax.clear_caches() between
# modules prevents it, so the suite is simply split across a process
# boundary before the crash zone. Same tests, same flags, two interpreters.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_[a-o]*.py -x -q "$@"
python -m pytest tests/test_[p-z]*.py -x -q "$@"
