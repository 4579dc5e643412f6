"""Data-size sweep for helmholtz DIPNet accuracy curves.

Port of `applications/helmholtz_2d/dipnet_paper/helmholtz_multirun.py`
(reference): per-architecture x data-size x weight-seed sweep with a
resumable pickled master logger, using the helmholtz DIPResNet variant
(sigmoid residual activation).

Run: python applications/helmholtz_multirun.py --data_dir helmholtz_output/
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="helmholtz_output/")
    parser.add_argument(
        "--architectures", type=str, default="as_resnet,kle_dense,generic_dense"
    )
    parser.add_argument("--data_sizes", type=str, default="32,64,128,256,512")
    parser.add_argument("--n_seeds", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=150)
    parser.add_argument("--fixed_input_rank", type=int, default=8)
    parser.add_argument("--fixed_output_rank", type=int, default=16)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    from applications.confusion_training import (
        get_projectors,
        load_confusion_data,
        modify_projectors,
    )
    from hippyflow_tpu.nn import (
        GenericDense,
        projected_dense,
        projected_low_rank_residual_network,
        train,
    )

    out_path = args.out or os.path.join(args.data_dir, "master_logger.pkl")
    master = {}
    if os.path.exists(out_path):  # resume
        with open(out_path, "rb") as f:
            master = pickle.load(f)

    m_all, q_all = load_confusion_data(args.data_dir)
    projectors = get_projectors(
        args.data_dir,
        fixed_input_rank=args.fixed_input_rank,
        fixed_output_rank=args.fixed_output_rank,
    )

    for arch in args.architectures.split(","):
        for n in (int(s) for s in args.data_sizes.split(",")):
            if n > m_all.shape[0]:
                continue
            for seed in range(args.n_seeds):
                key = (arch, n, seed)
                if repr(key) in master:
                    continue
                if arch in ("as_dense", "kle_dense", "as_resnet"):
                    basis = "AS_input" if arch.startswith("as") else "KLE"
                    P, Phi = modify_projectors(projectors, basis)
                    if arch == "as_resnet":
                        model = projected_low_rank_residual_network(
                            P, Phi, residual_activation="sigmoid"
                        )
                    else:
                        model = projected_dense(P, Phi)
                else:
                    model = GenericDense(output_dim=q_all.shape[1])
                params, logger = train(
                    model,
                    m_all[:n],
                    q_all[:n],
                    epochs=args.epochs,
                    batch_size=min(128, n),
                    seed=seed,
                )
                master[repr(key)] = {
                    "train_acc": logger["train_acc"],
                    "val_acc": logger["val_acc"],
                }
                print(
                    f"{arch} n={n} seed={seed}: val_acc {logger['val_acc'][-1]:.4f}"
                )
                with open(out_path, "wb") as f:
                    pickle.dump(master, f)
    print(f"master logger at {out_path} with {len(master)} runs")


if __name__ == "__main__":
    main()
