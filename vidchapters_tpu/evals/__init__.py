from vidchapters_tpu.evals.ptb import PTBTokenizer
from vidchapters_tpu.evals.bleu import Bleu
from vidchapters_tpu.evals.rouge import Rouge
from vidchapters_tpu.evals.cider import Cider
from vidchapters_tpu.evals.meteor import Meteor
from vidchapters_tpu.evals.dvc import eval_dvc
from vidchapters_tpu.evals.soda import eval_soda
from vidchapters_tpu.evals.captioning import COCOEvalCap, eval_vc
from vidchapters_tpu.evals.moment import eval_submission
from vidchapters_tpu.evals.para import eval_para

__all__ = [
    "PTBTokenizer",
    "Bleu",
    "Rouge",
    "Cider",
    "Meteor",
    "eval_dvc",
    "eval_soda",
    "COCOEvalCap",
    "eval_vc",
    "eval_submission",
    "eval_para",
]
