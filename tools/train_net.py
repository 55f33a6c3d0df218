#!/usr/bin/env python
"""Training / evaluation entry point (reference: tools/train_net.py).

Examples:
  python tools/train_net.py --config-file configs/vqvae/PR-DVQVAE2.yaml
  python tools/train_net.py --config-file configs/vt/DSFVT.yaml --eval-only \
      TEST.EVALUATORS "BitsEvaluator" DATASETS.TEST "('prdvqvae_test',)"
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lvt_tpu.config import get_cfg
from lvt_tpu.engine.defaults import (
    DefaultTrainer,
    default_argument_parser,
    default_setup,
    run_test,
)
from lvt_tpu.evaluation import verify_results


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    if args.multihost:
        import jax

        jax.distributed.initialize()

    cfg = setup(args)

    if args.eval_only:
        from lvt_tpu.models import build_model
        import jax

        model = build_model(cfg)
        params, state = model.init(jax.random.key(max(cfg.SEED, 0)))
        # restore trained weights from OUTPUT_DIR (orbax) or pretrained .pth
        from lvt_tpu.checkpoint import latest_checkpoint, load_checkpoint

        ckpt = latest_checkpoint(cfg.OUTPUT_DIR)
        if ckpt is not None:
            tree = load_checkpoint(ckpt, {"params": params, "model_state": state}, partial=True)
            params, state = tree["params"], tree["model_state"]
        else:
            from lvt_tpu.evaluation.vt_sampler import load_vqvae_weights
            from lvt_tpu.models.vqvae import VQVAE, AutoEncoder

            if isinstance(model, (VQVAE, AutoEncoder)):
                params, state = load_vqvae_weights(
                    model, params, state,
                    cfg.MODEL.ENCODER.WEIGHTS, cfg.MODEL.GENERATOR.WEIGHTS,
                    cfg.MODEL.CODEBOOK.WEIGHTS)
            else:
                gen = cfg.MODEL.GENERATOR.WEIGHTS
                if gen and not os.path.exists(gen):
                    # configured-but-absent weights must not silently
                    # degrade to random init (same contract as
                    # load_vqvae_weights): the eval would report
                    # plausible-looking garbage
                    raise FileNotFoundError(
                        f"MODEL.GENERATOR.WEIGHTS={gen!r} does not exist "
                        f"and OUTPUT_DIR has no checkpoint")
                if gen and gen.endswith(".pth"):
                    from lvt_tpu.checkpoint.torch_convert import (
                        convert_video_transformer,
                        load_torch_state_dict,
                    )

                    params = {"netG": convert_video_transformer(
                        load_torch_state_dict(gen), model.c)}
        results = run_test(cfg, model, params, state)
        verify_results(cfg, results)
        return results

    trainer = DefaultTrainer(cfg)
    start_iter = trainer.resume_or_load(resume=args.resume)
    trainer.train(start_iter, cfg.SOLVER.MAX_ITER)
    return None


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    print("Command Line Args:", args)
    main(args)
