#!/bin/bash
# Build the reference DDalphaAMG binary single-rank (no MPI library) for
# same-machine, same-problem baseline runs.  The read-only reference tree
# is copied to a scratch dir and compiled with gcc + the single-rank MPI
# stub in this directory (the same construction that produced
# tests/ground_truth/*.log).
#
# Usage: bash scripts/refbench/build.sh [scratch-dir]
set -eu
here="$(cd "$(dirname "$0")" && pwd)"
scratch="${1:-/tmp/refbuild}"
ref=/root/reference

rm -rf "$scratch"
mkdir -p "$scratch"
cp -r "$ref"/src "$ref"/Makefile "$ref"/*.sed "$scratch"/
mkdir -p "$scratch"/build/gsrc "$scratch"/lib "$scratch"/include "$scratch"/doc
cp "$here"/mpi.h "$here"/mpi_stub.c "$scratch"/

cd "$scratch"
# gcc instead of mpicc; stub include dir; skip the LaTeX documentation
make -j"$(nproc)" dd_alpha_amg \
    CC="gcc -std=gnu99 -Wall -I$scratch" \
    2>&1 | tail -5
gcc -std=gnu99 -O2 -c mpi_stub.c -o build/mpi_stub.o -I"$scratch"
# relink with the stub; drop the library-API TU (dd_alpha_amg.o) whose
# globals collide with main.o under -fno-common
rm -f build/dd_alpha_amg.o
gcc -std=gnu99 -fopenmp -O3 -ffast-math -o dd_alpha_amg \
    build/*.o -lm
echo "built: $scratch/dd_alpha_amg"
