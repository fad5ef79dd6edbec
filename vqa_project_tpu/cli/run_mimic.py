"""MIMIC-CXR VQA grid-search CLI.

Parity target: /root/reference/run_mimic.py (same grid-search harness
as run_imageclef.py against MimicDataset; the reference's 10*bsize
accuracy denominator at run_mimic.py:208 is a documented bug we do not
replicate — accuracy here divides by the validation-set size).
"""

from vqa_project_tpu.cli.medical import grid_search_main, medical_input_args


def main(argv=None):
    args, parser, unparsed = medical_input_args(
        argv, n_obj_default=51, neigh_default=19)
    grid_search_main(args, parser, unparsed, dataset_name="mimic",
                     ckpt_prefix="mimic")


if __name__ == "__main__":
    main()
