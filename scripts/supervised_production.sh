#!/usr/bin/env bash
# Teacher GNN supervised training, production setting (reference
# scripts/supervised_production.sh).
set -e
cd "$(dirname "$0")/.."

for dataset in cora citeseer pubmed coauthor-cs coauthor-physics; do
  python -m llp_tpu.cli.train_teacher --datasets=${dataset} --encoder=sage --runs=10 --transductive=production
done

python -m llp_tpu.cli.train_teacher --datasets=amazon-computers --encoder=sage --lr=0.001 --runs=10 --transductive=production
python -m llp_tpu.cli.train_teacher --datasets=amazon-photos --encoder=sage --lr=0.001 --runs=10 --transductive=production
