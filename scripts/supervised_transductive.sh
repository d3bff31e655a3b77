#!/usr/bin/env bash
# Teacher GNN supervised training, transductive (reference
# scripts/supervised_transductive.sh): run BEFORE the student scripts — they
# consume the exported teacher checkpoints/features.
set -e
cd "$(dirname "$0")/.."

for dataset in cora citeseer pubmed coauthor-cs coauthor-physics; do
  python -m llp_tpu.cli.train_teacher --datasets=${dataset} --encoder=sage --runs=10 --lr=0.005 --transductive=transductive
done

for dataset in amazon-photos amazon-computers; do
  python -m llp_tpu.cli.train_teacher --datasets=${dataset} --encoder=sage --runs=10 --lr=0.001 --transductive=transductive
done

python -m llp_tpu.cli.train_teacher --datasets=collab --encoder=sage --num_layers=3 --runs=10 --lr=0.005 --transductive=transductive
