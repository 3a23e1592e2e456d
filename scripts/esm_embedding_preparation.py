"""ESM embedding preparation: extract FASTA from PDBs and/or precompute
embeddings into the .npz format the dataset layer consumes.

Parity with the reference's ESM prep scripts
(datasets/esm_embedding_preparation.py, esm_embeddings_to_pt.py): either
write a FASTA for an external ESM pipeline, or — when ESM2 weights are
available locally via transformers — compute per-chain embeddings directly.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffdock_pocket_tpu.data import dataset as ds
from diffdock_pocket_tpu.data import esm as esmmod
from diffdock_pocket_tpu.data.pdb import parse_pdb


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_csv", required=True)
    p.add_argument("--out_fasta", default=None)
    p.add_argument("--out_npz", default=None)
    args = p.parse_args()
    df = ds.load_protein_ligand_df(args.data_csv)

    if args.out_fasta:
        with open(args.out_fasta, "w") as fh:
            for _, row in df.iterrows():
                name = row["complex_name"]
                seqs = esmmod.get_chain_sequences(parse_pdb(row["experimental_protein"]))
                for ci, s in enumerate(seqs):
                    if s:
                        fh.write(f">{name}_chain_{ci}\n{s}\n")
        print(f"wrote FASTA to {args.out_fasta}")

    if args.out_npz:
        if not esmmod.esm_available():
            raise SystemExit(
                "ESM2 weights not available locally; use --out_fasta with an "
                "external ESM pipeline instead"
            )
        embedder = esmmod._make_embedder()
        table = {}
        for _, row in df.iterrows():
            name = row["complex_name"]
            seqs = esmmod.get_chain_sequences(parse_pdb(row["experimental_protein"]))
            embs = embedder.embed_chains(seqs)
            for ci, e in enumerate(embs):
                table[f"{name}_chain_{ci}"] = e
        np.savez_compressed(args.out_npz, **table)
        print(f"wrote embeddings to {args.out_npz}")


if __name__ == "__main__":
    main()
