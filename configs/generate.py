"""Generate the config corpus: reference-parameter-matched experiment
configs (reference: /root/reference/configs/*.yaml) plus hermetic synthetic
smoke configs.  Re-run after editing: python configs/generate.py"""

import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))

# dataset root placeholders -- point these at your data
CELEBA_TRAIN = "${DATA_ROOT}/celeba/train"
CELEBA_TEST = "${DATA_ROOT}/celeba/test"
IMAGENET64 = "${DATA_ROOT}/imagenet64"


def dense(growth, depth, act, dtype=None):
    d = dict(name="DenseBlock", growth_channel=growth, depth=depth,
             layer=dict(name="DenseLayer", act=act))
    if dtype:  # compute dtype of the conv stack (params stay float32)
        d["dtype"] = dtype
    return d


def rnd():
    return dict(name="Round", nbits=8)


def flow(name="IDFlows", H=64, W=64, nflows=8, nsplit=3, couple_g=512,
         couple_d=12, prior_g=512, prior_d=12, act="ReLU", scale=2,
         C=3, dtype=None, **extra):
    return dict(
        name=name, nflows=nflows, nbits=8, nsplit=nsplit, H=H, W=W, C=C,
        couple=dict(name="AdditiveCouple", split=0.75,
                    nn=dense(couple_g, couple_d, act, dtype), round=rnd()),
        extenddim=dict(name="ExtendDim", scale=scale),
        prior=dict(name="Prior", round=rnd(),
                   nn=dense(prior_g, prior_d, act, dtype)),
        distribution=dict(name="DLogistic"), round=rnd(), **extra)


def celeba_loader(batch, train, pad=(1, 6), resize=(215, 178)):
    d = dict(name="CommonDataLoader",
             path=CELEBA_TRAIN if train else CELEBA_TEST,
             batch_size=batch, resize=list(resize),
             centercrop=[215, 178], nbits=8, train=train)
    if pad:
        d["pad"] = list(pad)
    return d


def in64_loader(batch, train):
    return dict(name="CustomDataLoader",
                dataset=dict(name="ImageNet64Dataset", path=IMAGENET64,
                             size=[3, 64, 64], train=train),
                batch_size=batch, nbits=8, train=train)


def synth_loader(batch, train, size=(32, 32, 3), length=64, seed=0,
                 cache=False):
    return dict(name="CustomDataLoader",
                dataset=dict(name="SyntheticImages", size=list(size),
                             length=length, seed=seed),
                batch_size=batch, nbits=8, train=train,
                shuffle=bool(train), cache=cache)


def nat_loader(batch, train, size=(64, 64, 3), length=64, seed=0,
               cache=False):
    return dict(name="CustomDataLoader",
                dataset=dict(name="NaturalSynthetic", size=list(size),
                             length=length, seed=seed),
                batch_size=batch, nbits=8, train=train,
                shuffle=bool(train), cache=cache)


def sched():
    return dict(name="WarmUpScheduler", warmup=10, beta=0.99)


def opt():
    return dict(name="Adamax", lr=0.001)


def tail(tag, max_step=1000000, spe=1000, ev=5000, sv=20000, log_every=20):
    # log_every: host-sync cadence for scalar logging -- every trainer
    # reads the loss only every log_every steps so the device pipeline
    # stays hot on high-latency runtimes (train/trainer.py discipline,
    # now shared by Residual/TwoLevel/VQVAE trainers).  Pass None for
    # trainers without the knob (Finetuner logs per-image bpd by design).
    d = dict(optimizer=opt(), scheduler=sched(), max_step=max_step,
             step_per_epoch=spe, evaluate_interval=ev, save_interval=sv,
             save_path=f"./logs/{tag}.ckpt",
             writer_path=f"./logs/log_{tag}")
    if log_every is not None:
        d["log_every"] = log_every
    return d


def vqvae(checkpoint=None, reinit=True, dist="BinomialDistribution"):
    d = dict(name="VQVAE", channel=3, embed_num=8192, embed_dim=512,
             encoder=dict(name="VQEncoder", block_num=8,
                          block=dict(name="ResBlock", batch_norm=False)),
             decoder=dict(name="VQDecoder", block_num=8,
                          block=dict(name="ResBlock", batch_norm=False)),
             distribution=dict(name=dist),
             hidden_dims=[128, 256, 512], batch_norm=False)
    if reinit:
        d["vectorquantizer"] = dict(reinit_interval=1000, threshold=0.1)
    if checkpoint:
        d["checkpoint"] = checkpoint
    return d


CONFIGS = {}

# -- flows on CelebA 216x184 with in-loop coding test (ref: config1.yaml)
CONFIGS["config1"] = dict(train=dict(
    model=flow(H=216, W=184, couple_g=384, couple_d=8, prior_g=512,
               prior_d=12, act="LeakyReLU"),
    test_coding=True,
    train_dataloader=celeba_loader(4, True),
    test_dataloader=celeba_loader(4, False),
    **tail("celeba_216_184")))

# -- flows on CelebA resized 128x96, nsplit=4 (ref: config2.yaml)
CONFIGS["config2"] = dict(train=dict(
    model=flow(H=128, W=96, nsplit=4, couple_g=512, couple_d=8,
               prior_g=256, prior_d=8, act="ReLU"),
    test_coding=True,
    train_dataloader=celeba_loader(8, True, pad=None, resize=(128, 96)),
    test_dataloader=celeba_loader(8, False, pad=None, resize=(128, 96)),
    **tail("celeba_128_96", ev=10000, sv=25000)))

# -- config1 variant with batch_squeeze=4 (ref: config11.yaml)
CONFIGS["config11"] = dict(train=dict(
    model=flow(H=216, W=184, couple_g=384, couple_d=8, prior_g=512,
               prior_d=12, act="LeakyReLU", batch_squeeze=4),
    test_coding=False,
    train_dataloader=celeba_loader(4, True),
    test_dataloader=celeba_loader(4, False),
    **tail("celeba_216_184_bsq4")))

# -- flows on ImageNet64 (ref: imagenet64.yaml)
CONFIGS["imagenet64"] = dict(train=dict(
    model=flow(H=64, W=64),
    test_coding=True,
    steps_per_dispatch=4,
    train_dataloader=in64_loader(16, True),
    test_dataloader=in64_loader(16, False),
    **tail("imagenet64", ev=10000, sv=25000)))

# -- two-level pyramid (ref: config_twolevel.yaml)
CONFIGS["config_twolevel"] = dict(train=dict(
    trainer="TwoLevelTrainer",
    model=dict(name="TwoLevelFlows", H=215, W=178, C=3, pad=[1, 6],
               fine_flows=flow(H=8, W=8, nflows=12, nsplit=1, couple_g=512,
                               couple_d=8, prior_g=512, prior_d=8),
               rough_flows=flow(H=27, W=23, nflows=12, nsplit=1,
                                couple_g=512, couple_d=8, prior_g=512,
                                prior_d=8, scale=1),
               batchsize=256),
    train_dataloader=celeba_loader(4, True, pad=None),
    test_dataloader=celeba_loader(4, False, pad=None),
    **tail("twolevel_celeba")))

# -- VQ-VAE pretraining.  The reference trains these with Adam 1e-4 and
#    loss weights alpha=1.0 beta=0.1 gamma=0.25
#    (ref: vqvae_for_celeba_full*.yaml train_args / optimizer)
def _vqvae_train(tag, model, loader_fn):
    t = tail(tag)
    t["optimizer"] = dict(name="Adam", lr=0.0001)
    return dict(train=dict(
        trainer="VQVAETrainer",
        model=model,
        train_dataloader=loader_fn(32, True),
        test_dataloader=loader_fn(32, False),
        train_args=dict(alpha=1.0, beta=0.1, gamma=0.25),
        **t))


# (ref: vqvae_for_celeba_full.yaml -- no dead-code reinit)
CONFIGS["vqvae_for_celeba_full"] = _vqvae_train(
    "vqvae_celeba", vqvae(reinit=False), celeba_loader)
# (ref: vqvae_for_celeba_full_reinit.yaml)
CONFIGS["vqvae_for_celeba_full_reinit"] = _vqvae_train(
    "vqvae_celeba_reinit", vqvae(), celeba_loader)
# (ref: vqvae_for_celeba_full_reinit_normal.yaml -- N(y,1) recon loss)
CONFIGS["vqvae_for_celeba_full_reinit_normal"] = _vqvae_train(
    "vqvae_celeba_reinit_normal",
    vqvae(dist="UnitGaussianDistribution"), celeba_loader)
# (ref: vqvae_for_imagenet64_reinit.yaml)
CONFIGS["vqvae_for_imagenet64_reinit"] = _vqvae_train(
    "vqvae_imagenet64_reinit", vqvae(), in64_loader)

# -- residual pipelines (ref: resflows.yaml, resflow-patches-vqvae.yaml,
#    resflows_smallpatch_split.yaml, resflow-cond-imagenet64.yaml)
CONFIGS["resflows"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(H=54, W=46, nflows=16, nsplit=1, couple_g=256, couple_d=8,
               prior_g=256, prior_d=8, act="LeakyReLU"),
    vqvae=vqvae("./logs/vqvae_celeba_reinit.ckpt"),
    input_size=[216, 184],
    patch_batch_size=0,
    train_dataloader=celeba_loader(1, True),
    test_dataloader=celeba_loader(1, False),
    **tail("resflows_54_46")))

CONFIGS["resflow-patches-vqvae"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(name="ConditionalFlows", H=27, W=23, nflows=8, nsplit=1,
               couple_g=384, couple_d=12, prior_g=512, prior_d=12,
               act="LeakyReLU", scale=1, conv_for_cond=False),
    vqvae=vqvae("./logs/vqvae_celeba_reinit.ckpt"),
    input_size=[216, 184],
    patch_batch_size=0,
    train_dataloader=celeba_loader(1, True),
    test_dataloader=celeba_loader(1, False),
    **tail("resflows_cond_27_23")))

# -- residual flows on the FULL image, no patching (ref: resflow-direct.yaml)
CONFIGS["resflow-direct"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(H=216, W=184, nflows=8, nsplit=3, couple_g=384, couple_d=8,
               prior_g=704, prior_d=12, act="LeakyReLU"),
    vqvae=vqvae("./logs/vqvae_celeba_reinit.ckpt"),
    input_size=[216, 184],
    patch_batch_size=0,
    train_dataloader=celeba_loader(3, True),
    test_dataloader=celeba_loader(3, False),
    **tail("resflows_direct_prior704")))

# -- conditional residual flows, full image, strided-conv conditioning
#    (ref: resflow-direct-cond.yaml)
CONFIGS["resflow-direct-cond"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(name="ConditionalFlows", H=216, W=184, nflows=8, nsplit=3,
               couple_g=384, couple_d=8, prior_g=512, prior_d=12,
               act="LeakyReLU", conv_for_cond=True),
    vqvae=vqvae("./logs/vqvae_celeba_reinit.ckpt"),
    input_size=[216, 184],
    patch_batch_size=0,
    train_dataloader=celeba_loader(4, True),
    test_dataloader=celeba_loader(4, False),
    **tail("resflows_direct_cond_conv")))

# -- patch flows trained directly on image patches, bypassing the VQ-VAE
#    residual (ref: resflow-patches-novqvae.yaml, nouse_vqvae: True)
CONFIGS["resflow-patches-novqvae"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(H=27, W=23, nflows=8, nsplit=1, couple_g=384, couple_d=12,
               prior_g=512, prior_d=12, act="LeakyReLU", scale=1),
    nouse_vqvae=True,
    vqvae=vqvae("./logs/vqvae_celeba_reinit.ckpt"),
    input_size=[216, 184],
    patch_batch_size=0,
    train_dataloader=celeba_loader(1, True),
    test_dataloader=celeba_loader(1, False),
    **tail("resflows_novqvae_27_23")))

# -- unconditional flows on VQ residual patches
#    (ref: resflow-patches-vqvae-nocond.yaml)
CONFIGS["resflow-patches-vqvae-nocond"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(H=27, W=23, nflows=8, nsplit=1, couple_g=384, couple_d=12,
               prior_g=512, prior_d=12, act="LeakyReLU", scale=1),
    vqvae=vqvae("./logs/vqvae_celeba_reinit.ckpt"),
    input_size=[216, 184],
    patch_batch_size=0,
    train_dataloader=celeba_loader(1, True),
    test_dataloader=celeba_loader(1, False),
    **tail("resflows_no_cond_27_23")))

# -- 8x8 patches, single split (ref: resflows_smallpatch.yaml)
CONFIGS["resflows_smallpatch"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(H=8, W=8, nflows=12, nsplit=1, couple_g=512, couple_d=12,
               prior_g=256, prior_d=4, act="ReLU"),
    vqvae=vqvae("./logs/vqvae_celeba_reinit.ckpt"),
    input_size=[216, 184],
    patch_batch_size=256,
    train_dataloader=celeba_loader(16, True),
    test_dataloader=celeba_loader(1, False),
    scheduler=dict(name="WarmUpScheduler", warmup=10, beta=0.999),
    optimizer=opt(), max_step=1000000, step_per_epoch=25, log_every=20,
    evaluate_interval=250, save_interval=1000,
    save_path="./logs/resflows_smallpatch.ckpt",
    writer_path="./logs/log_resflows_smallpatch"))

CONFIGS["resflows_smallpatch_split"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(H=8, W=8, nflows=8, nsplit=2, couple_g=512, couple_d=8,
               prior_g=512, prior_d=4),
    vqvae=vqvae("./logs/vqvae_celeba_reinit.ckpt"),
    input_size=[216, 184],
    patch_batch_size=256,
    train_dataloader=celeba_loader(1, True),
    test_dataloader=celeba_loader(1, False),
    **tail("resflows_8_8_split")))

CONFIGS["resflow-cond-imagenet64"] = dict(train=dict(
    trainer="ResidualTrainer",
    flows=flow(name="ConditionalFlows", H=64, W=64, nflows=8, nsplit=3,
               couple_g=384, couple_d=8, prior_g=512, prior_d=12,
               act="LeakyReLU", conv_for_cond=True),
    vqvae=vqvae("./logs/vqvae_imagenet64_reinit.ckpt"),
    input_size=[64, 64],
    patch_batch_size=0,
    train_dataloader=in64_loader(4, True),
    test_dataloader=in64_loader(4, False),
    **tail("resflows_cond_imagenet64")))

# -- per-image fine-tuning (ref: config-trans-test.yaml)
CONFIGS["config-trans-test"] = dict(train=dict(
    trainer="Finetuner",
    fine_tune=True,
    fine_tune_lr=0.001,
    model=dict(load_path="./logs/imagenet64.ckpt",
               **flow(H=64, W=48)),
    train_dataloader=celeba_loader(16, True, pad=None, resize=(64, 48)),
    test_dataloader=celeba_loader(16, False, pad=None, resize=(64, 48)),
    **tail("trans_test", log_every=None)))

# -- visualization (ref: vis_config1.yaml)
CONFIGS["vis_config1"] = dict(train=dict(
    model=dict(load_path="./logs/celeba_216_184.ckpt",
               **flow(H=216, W=184, couple_g=384, couple_d=8, prior_g=512,
                      prior_d=12, act="LeakyReLU")),
    test_dataloader=celeba_loader(4, False),
))

# -- visualization on ImageNet64 (ref: vis_config_imagenet64.yaml)
CONFIGS["vis_config_imagenet64"] = dict(train=dict(
    model=dict(load_path="./logs/imagenet64.ckpt",
               **flow(H=64, W=64, couple_g=512, couple_d=12, prior_g=512,
                      prior_d=12, act="ReLU")),
    test_dataloader=in64_loader(4, False),
))

# -- the hermetic headline run: ImageNet64-shaped flows trained on 64x64
#    synthetic images until the coded real_bpd beats the classical codecs
#    (cli.baselines --synthetic PNG/WebP panel on the SAME held-out set:
#    SyntheticImages seed=0 length=32).  Train split is seed=1 (disjoint
#    SeedSequence streams).  No reference counterpart: the reference's
#    equivalent evidence is its CelebA training curve
#    (reference: utils/fig/train_bpd.png, trainer.py:239-240,326-327).
CONFIGS["synthetic64"] = dict(train=dict(
    steps_per_dispatch=4,
    model=flow(H=64, W=64, nflows=8, nsplit=3, couple_g=256, couple_d=6,
               prior_g=256, prior_d=6, act="ReLU"),
    test_coding=True,
    log_every=20,
    train_dataloader=synth_loader(32, True, size=(64, 64, 3), length=8192,
                                  seed=1, cache=True),
    test_dataloader=synth_loader(8, False, size=(64, 64, 3), length=32,
                                 seed=0, cache=True),
    optimizer=opt(),
    scheduler=dict(name="WarmUpScheduler", warmup=2, beta=0.995),
    max_step=30000, step_per_epoch=256,
    evaluate_interval=2500, save_interval=2500,
    save_path="./logs/synthetic64.ckpt",
    writer_path="./logs/log_synthetic64"))

# -- scaled-up variant of the headline run (wider NN, more data, longer
#    schedule); used to push the learned-vs-classical margin further
CONFIGS["synthetic64_xl"] = dict(train=dict(
    steps_per_dispatch=4,
    model=flow(H=64, W=64, nflows=8, nsplit=3, couple_g=384, couple_d=8,
               prior_g=384, prior_d=8, act="ReLU"),
    test_coding=True,
    log_every=20,
    train_dataloader=synth_loader(64, True, size=(64, 64, 3), length=16384,
                                  seed=1, cache=True),
    test_dataloader=synth_loader(8, False, size=(64, 64, 3), length=32,
                                 seed=0, cache=True),
    optimizer=opt(),
    scheduler=dict(name="WarmUpScheduler", warmup=4, beta=0.998),
    max_step=60000, step_per_epoch=256,
    evaluate_interval=5000, save_interval=5000,
    save_path="./logs/synthetic64_xl.ckpt",
    writer_path="./logs/log_synthetic64_xl"))

# -- bfloat16 mixed-precision variant: conv stacks compute at the MXU's
#    native bfloat16 rate (params float32, coding stays bit-exact --
#    models/layers.py DenseBlock docstring)
CONFIGS["synthetic64_xl_bf16"] = dict(train=dict(
    steps_per_dispatch=4,
    model=flow(H=64, W=64, nflows=8, nsplit=3, couple_g=384, couple_d=8,
               prior_g=384, prior_d=8, act="ReLU", dtype="bfloat16"),
    test_coding=True,
    log_every=20,
    train_dataloader=synth_loader(64, True, size=(64, 64, 3), length=16384,
                                  seed=1, cache=True),
    test_dataloader=synth_loader(8, False, size=(64, 64, 3), length=32,
                                 seed=0, cache=True),
    optimizer=opt(),
    scheduler=dict(name="WarmUpScheduler", warmup=4, beta=0.998),
    max_step=60000, step_per_epoch=256,
    evaluate_interval=5000, save_interval=5000,
    save_path="./logs/synthetic64_xl_bf16.ckpt",
    writer_path="./logs/log_synthetic64_xl_bf16"))

# -- natural-statistics training run: the same ImageNet64-shaped flow
#    trained on the NaturalSynthetic family (1/f-spectrum fields + edges
#    + textures -- statistics shaped like photographs, unlike the
#    box-blur SyntheticImages).  Held-out split is a disjoint seed
#    stream; the filecodec demo codes a further held-out corpus with
#    this checkpoint (VERDICT r4 item 8 / BASELINE metric a).
CONFIGS["natural64"] = dict(train=dict(
    steps_per_dispatch=4,
    model=flow(H=64, W=64, nflows=8, nsplit=3, couple_g=256, couple_d=6,
               prior_g=256, prior_d=6, act="ReLU"),
    test_coding=True,
    log_every=20,
    train_dataloader=nat_loader(32, True, size=(64, 64, 3), length=8192,
                                seed=1, cache=True),
    test_dataloader=nat_loader(8, False, size=(64, 64, 3), length=32,
                               seed=0, cache=True),
    optimizer=opt(),
    scheduler=dict(name="WarmUpScheduler", warmup=2, beta=0.995),
    max_step=30000, step_per_epoch=256,
    evaluate_interval=2500, save_interval=2500,
    save_path="./logs/natural64.ckpt",
    writer_path="./logs/log_natural64"))

# -- hermetic synthetic smokes (no reference counterpart; CPU-runnable)
CONFIGS["smoke_synthetic"] = dict(train=dict(
    model=flow(H=16, W=16, nflows=2, nsplit=2, couple_g=16, couple_d=2,
               prior_g=16, prior_d=2, act="LeakyReLU"),
    test_coding=True,
    train_dataloader=synth_loader(4, True, size=(16, 16, 3)),
    test_dataloader=synth_loader(4, False, size=(16, 16, 3)),
    optimizer=opt(), scheduler=sched(), max_step=50, step_per_epoch=10,
    evaluate_interval=50, save_interval=50,
    save_path="./logs/smoke.ckpt", writer_path="./logs/log_smoke"))


# the reference ships resflow-direct-cond-1.yaml as a byte-identical
# duplicate of resflow-direct-cond.yaml; mirror it for 23/23 config parity
CONFIGS["resflow-direct-cond-1"] = CONFIGS["resflow-direct-cond"]


def main():
    for name, cfg in CONFIGS.items():
        path = os.path.join(HERE, f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        print("wrote", path)


if __name__ == "__main__":
    main()
