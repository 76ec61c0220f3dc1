set -x
python tools/kbench.py --op gdfn --shape 8 512 512 48 --inner 6 --reps 2
python tools/kbench.py --op gdfn --shape 8 512 512 48 --inner 6 --reps 2 --ablate-gelu
python tools/kbench.py --op mdta --shape 8 512 512 48 --inner 6 --reps 2
python tools/kbench.py --op gdfn --shape 8 512 512 96 --inner 6 --reps 2
python tools/kbench.py --op mdta --shape 8 512 512 96 --heads 2 --inner 6 --reps 2
