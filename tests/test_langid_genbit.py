"""Model-grade language ID + GenBit-style gender metrics (VERDICT r2 #7).

langdetect/genbit are not installable in this environment, so the agreement
fixture is held-out text per language (different register and vocabulary
from the seed corpora langid trains on at import): the detector must
classify every one correctly, which a lexicon heuristic cannot do across
20 languages/6 scripts. GenBit checks pin the metric semantics:
definition-word percentages, co-occurrence bias direction, distance
weighting, and the percentile frequency cutoff.
"""

import math

import pytest

from vidchapters_tpu.factory import langid
from vidchapters_tpu.factory.genbit import GenBitMetrics, gender_metrics

# held-out sentences: news/weather/sports register, none shared with the
# seed corpora
HELD_OUT = {
    "en": "the government announced new measures yesterday while heavy rain "
          "continued across the northern regions of the country",
    "es": "el gobierno anunció ayer nuevas medidas mientras las fuertes "
          "lluvias continuaban en las regiones del norte del país",
    "fr": "le gouvernement a annoncé hier de nouvelles mesures alors que de "
          "fortes pluies continuaient dans les régions du nord du pays",
    "de": "die regierung kündigte gestern neue maßnahmen an, während starker "
          "regen in den nördlichen regionen des landes anhielt",
    "pt": "o governo anunciou ontem novas medidas enquanto chuvas fortes "
          "continuavam nas regiões do norte do país",
    "it": "il governo ha annunciato ieri nuove misure mentre forti piogge "
          "continuavano nelle regioni settentrionali del paese",
    "nl": "de regering kondigde gisteren nieuwe maatregelen aan terwijl "
          "zware regen aanhield in de noordelijke regio's van het land",
    "sv": "regeringen tillkännagav i går nya åtgärder medan kraftigt regn "
          "fortsatte i landets norra regioner",
    "pl": "rząd ogłosił wczoraj nowe środki, podczas gdy ulewne deszcze "
          "trwały w północnych regionach kraju",
    "cs": "vláda včera oznámila nová opatření, zatímco silné deště "
          "pokračovaly v severních oblastech země",
    "tr": "hükümet dün yeni önlemler açıkladı, ülkenin kuzey bölgelerinde "
          "şiddetli yağmur devam ederken",
    "id": "pemerintah mengumumkan langkah-langkah baru kemarin sementara "
          "hujan deras terus terjadi di wilayah utara negara itu",
    "vi": "chính phủ đã công bố các biện pháp mới hôm qua trong khi mưa lớn "
          "tiếp tục ở các khu vực phía bắc của đất nước",
    "ru": "правительство вчера объявило о новых мерах, пока сильные дожди "
          "продолжались в северных районах страны",
    "uk": "уряд учора оголосив про нові заходи, поки сильні дощі тривали в "
          "північних районах країни",
    "ar": "أعلنت الحكومة أمس عن إجراءات جديدة بينما استمرت الأمطار الغزيرة "
          "في المناطق الشمالية من البلاد",
    "hi": "सरकार ने कल नए उपायों की घोषणा की जबकि देश के उत्तरी क्षेत्रों में भारी "
          "बारिश जारी रही",
    "ja": "政府は昨日新しい対策を発表しましたが、国の北部地域では大雨が続いています",
    "ko": "정부는 어제 새로운 조치를 발표했으며 나라의 북부 지역에서는 폭우가 계속되고 있습니다",
    "zh": "政府昨天宣布了新的措施，而该国北部地区的暴雨仍在继续",
}


def test_langid_classifies_held_out_text():
    wrong = {}
    for lang, text in HELD_OUT.items():
        got = langid.detect(text)
        if got != lang:
            wrong[lang] = got
    assert not wrong, f"misclassified: {wrong}"


def test_langid_posteriors_ranked_and_normalized():
    ranked = langid.detect_langs(HELD_OUT["fr"], top_k=len(
        langid.supported_languages()))
    assert ranked[0][0] == "fr"
    assert ranked[0][1] > ranked[-1][1]
    assert sum(p for _, p in ranked) == pytest.approx(1.0, abs=1e-6)


def test_langid_empty_raises_like_langdetect():
    with pytest.raises(ValueError):
        langid.detect("   ")
    from vidchapters_tpu.factory.analysis import detect_language

    assert detect_language("") == "unknown"
    assert detect_language(HELD_OUT["de"]) == "de"


def test_langid_robust_to_asr_noise():
    """Concatenated ASR with fillers/numbers still classifies (the
    reference feeds raw joined ASR, language.py:63-67)."""
    noisy = ("uh so um " + HELD_OUT["en"] + " ok yeah 1 2 3 right "
             + HELD_OUT["en"])
    assert langid.detect(noisy) == "en"


# ---------------------------------------------------------------------------
# GenBit-style gender metrics
# ---------------------------------------------------------------------------


def test_genbit_definition_word_percentages():
    g = GenBitMetrics("en", context_window=5)
    g.add_data(["he saw her", "the man and the woman walked"],
               tokenized=False)
    m = g.get_metrics()
    # tokens: 3 + 6 = 9; male: he, man; female: her, woman
    assert m["percentage_of_male_gender_definition_words"] == \
        pytest.approx(100 * 2 / 9)
    assert m["percentage_of_female_gender_definition_words"] == \
        pytest.approx(100 * 2 / 9)
    assert m["percentage_of_non_binary_gender_definition_words"] == 0.0


def test_genbit_bias_direction():
    """Words that co-occur with one gender's definition words must carry
    the corresponding bias sign (GenBit's core construction)."""
    docs = (["the nurse helped her patient today"] * 6
            + ["the doctor finished his shift today"] * 6)
    m = gender_metrics(docs, percentile_cutoff=0)
    toks = m["token_based_metrics"]
    assert toks["nurse"]["bias"] > 0  # female-associated
    assert toks["doctor"]["bias"] < 0  # male-associated
    assert "nurse" in m["most_female_biased"]
    assert "doctor" in m["most_male_biased"]
    assert m["genbit_score"] > 0


def test_genbit_distance_weighting():
    """A definition word adjacent to the target outweighs a distant one
    (distance_weight**(d-1) decay)."""
    g = GenBitMetrics("en", context_window=5, distance_weight=0.5,
                      percentile_cutoff=0)
    g.add_data(["nurse her and then something else entirely"],
               tokenized=False)
    near = g._female_cooc["nurse"]
    g2 = GenBitMetrics("en", context_window=5, distance_weight=0.5,
                       percentile_cutoff=0)
    g2.add_data(["nurse and then something else her"], tokenized=False)
    far = g2._female_cooc["nurse"]
    assert near > far > 0


def test_genbit_percentile_cutoff_drops_rare_words():
    docs = ["his hammer"] * 20 + ["his chisel"]
    high = gender_metrics(docs, percentile_cutoff=80)
    low = gender_metrics(docs, percentile_cutoff=0)
    assert "chisel" not in high["token_based_metrics"]  # below cutoff
    assert "chisel" in low["token_based_metrics"]
    assert "hammer" in high["token_based_metrics"]


def test_genbit_statistics_payload():
    m = gender_metrics(["she and he walked the dog"])
    assert m["statistics"]["num_documents"] == 1
    assert m["statistics"]["num_tokens"] == 6
    assert "avg_bias_conditional" in m["statistics"]
    assert math.isfinite(m["genbit_score"])


def test_analysis_jobs_idempotent(tmp_path):
    """The sharded language job skips existing outputs (the reference's
    resumable-job pattern, analysis/language.py:60-61) and the gender job
    writes the GenBit metrics json."""
    import pickle

    from vidchapters_tpu.factory.analysis import (
        analyze_gender_job,
        analyze_language_job,
    )

    asr_dir = tmp_path / "asr"
    asr_dir.mkdir()
    for i, text in enumerate([HELD_OUT["en"], HELD_OUT["de"], ""]):
        with open(asr_dir / f"v{i}.pkl", "wb") as f:
            pickle.dump({"text": [text], "start": [0.0], "end": [1.0]}, f)
    out = tmp_path / "lang"
    assert analyze_language_job(str(asr_dir), str(out)) == 3
    assert analyze_language_job(str(asr_dir), str(out)) == 0  # idempotent
    langs = {}
    for f in out.glob("*.pkl"):
        with open(f, "rb") as fh:
            langs[f.stem] = pickle.load(fh)["asr_lang"]
    assert langs == {"v0": "en", "v1": "de", "v2": None}

    chapters = {"vid1": {"chapters": [{"label": "the king and his men"},
                                      {"label": "she bakes bread"}]}}
    pkl = tmp_path / "chapters.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(chapters, f)
    metrics = analyze_gender_job(str(pkl), str(tmp_path / "gender.json"))
    assert metrics["percentage_of_male_gender_definition_words"] > 0
    assert (tmp_path / "gender.json").exists()
