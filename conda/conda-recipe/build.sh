#!/bin/bash
# noarch python build: everything happens in meta.yaml's build.script.
# (The reference's build.sh drives CMake+SWIG against OpenMM; this
# package has no build step - the optional C++ neighbor-list extension
# compiles on demand at runtime via native/Makefile.)
set -e
python -m pip install . -vv --no-deps --no-build-isolation
