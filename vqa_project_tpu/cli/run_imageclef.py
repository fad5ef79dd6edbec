"""ImageCLEF-VQA-Med grid-search CLI.

Parity target: /root/reference/run_imageclef.py (grid over
neighbours x kernels, per-config train + sequential val inference,
grid_search_nodes_{n_obj}.txt, clef_* checkpoints, best-config CSV).
"""

from vqa_project_tpu.cli.medical import grid_search_main, medical_input_args


def main(argv=None):
    args, parser, unparsed = medical_input_args(
        argv, n_obj_default=51, neigh_default=19)
    grid_search_main(args, parser, unparsed, dataset_name="imageclef",
                     ckpt_prefix="clef")


if __name__ == "__main__":
    main()
