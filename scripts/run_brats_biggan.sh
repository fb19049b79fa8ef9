#!/bin/sh
# Canonical 3-seed BigGAN-Deep run (reference: run.sh) — the path+seed naming
# convention that eval/tournament assume.
python -m gan3d_tpu.cli.train --log_dir=BRATS_GANs/BigGAN0 --biggan=True --data_path=brats_train --filterD=64 --filterG=64 --hinge=True --seed=0
python -m gan3d_tpu.cli.train --log_dir=BRATS_GANs/BigGAN1 --biggan=True --data_path=brats_train --filterD=64 --filterG=64 --hinge=True --seed=1
python -m gan3d_tpu.cli.train --log_dir=BRATS_GANs/BigGAN2 --biggan=True --data_path=brats_train --filterD=64 --filterG=64 --hinge=True --seed=2
