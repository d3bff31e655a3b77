#!/usr/bin/env bash
# Student LLP distillation, transductive — the reference's blessed
# hyperparameters (reference scripts/LLP_transductive.sh) on the llp_tpu CLI.
set -e
cd "$(dirname "$0")/.."

python -m llp_tpu.cli.train_student --datasets=cora --KD_RM=0 --LLP_D=0.001 --KD_LM=0 --LLP_R=1 --True_label=0.1 --dropout=0.5 --encoder=sage --hops=2 --lr=0.01 --margin=0.1 --ns_rate=1 --ps_method=nb --rw_step=3 --transductive=transductive
python -m llp_tpu.cli.train_student --datasets=citeseer --KD_RM=0 --LLP_D=0.001 --KD_LM=0 --LLP_R=1000 --True_label=0.001 --dropout=0.5 --encoder=sage --hops=1 --lr=0.01 --margin=0.1 --ns_rate=4 --ps_method=nb --rw_step=3 --transductive=transductive
python -m llp_tpu.cli.train_student --datasets=pubmed --KD_RM=0 --LLP_D=0.1 --KD_LM=0 --LLP_R=0.1 --True_label=0.0001 --dropout=0.0 --encoder=sage --hops=3 --lr=0.01 --margin=0.05 --ns_rate=5 --ps_method=nb --rw_step=5 --transductive=transductive
python -m llp_tpu.cli.train_student --datasets=coauthor-cs --KD_RM=0 --LLP_D=100 --KD_LM=0 --LLP_R=0.1 --True_label=10 --dropout=0.0 --encoder=sage --hops=3 --lr=0.001 --margin=0.1 --ns_rate=4 --ps_method=nb --rw_step=3 --transductive=transductive
python -m llp_tpu.cli.train_student --datasets=coauthor-physics --KD_RM=0 --LLP_D=1 --KD_LM=0 --LLP_R=1 --True_label=1 --dropout=0.0 --encoder=sage --hidden_channels=512 --hops=15 --lr=0.001 --margin=0.05 --ns_rate=3 --num_layers=2 --ps_method=nb --rw_step=1 --minibatch --transductive=transductive
python -m llp_tpu.cli.train_student --datasets=amazon-photos --KD_RM=0 --LLP_D=1 --KD_LM=0 --LLP_R=1 --True_label=1 --dropout=0.0 --encoder=sage --hidden_channels=256 --hops=15 --lr=0.001 --margin=0.05 --ns_rate=10 --num_layers=2 --ps_method=nb --rw_step=3 --minibatch --transductive=transductive
python -m llp_tpu.cli.train_student --datasets=amazon-computers --KD_RM=0 --LLP_D=1 --KD_LM=0 --LLP_R=1 --True_label=1 --dropout=0.0 --encoder=sage --hidden_channels=512 --hops=5 --lr=0.0005 --margin=0.05 --ns_rate=5 --num_layers=2 --ps_method=nb --rw_step=2 --minibatch --transductive=transductive
python -m llp_tpu.cli.train_student --datasets=collab --KD_RM=0 --LLP_D=1 --KD_LM=0 --LLP_R=0 --True_label=1 --dropout=0.0 --encoder=sage --hidden_channels=1024 --hops=3 --lr=0.001 --margin=0.01 --ns_rate=3 --num_layers=3 --ps_method=nb --rw_step=3 --minibatch --transductive=transductive
