"""Character n-gram language identification, langdetect-style.

The reference runs the ``langdetect`` package (a port of the
language-detection Naive Bayes classifier over character n-gram profiles)
over each video's concatenated ASR (analysis/language.py:55-74). That
package — and its trained profile data — is not installable offline, so
this module trains compact char 1-3-gram profiles from built-in seed
corpora at import time and classifies with the same model family:
per-n-gram multinomial log-likelihood with additive smoothing, normalized
per n-gram so text length cancels.

Covers the language families the VidChapters-7M paper reports (English plus
the major European/Asian ASR languages). Profiles are deterministic (no
langdetect-style random sampling), so detection is reproducible.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Tuple

# seed corpora: a few sentences of typical conversational/tutorial register
# per language (authored for this module; the n-gram statistics, not the
# prose, are what matters)
_SEED_TEXT: Dict[str, str] = {
    "en": ("the quick brown fox jumps over the lazy dog. in this video we "
           "are going to show you how to make bread at home. thank you for "
           "watching and don't forget to subscribe to the channel. today we "
           "will talk about the history of the world and the people who "
           "changed it. welcome back everyone, this is the second part of "
           "the tutorial. first we need to mix the flour with the water. "
           "breaking news tonight as officials confirmed the agreement "
           "after months of talks. the home team scored twice in the "
           "second half to win the match. our flight leaves early in the "
           "morning so we should pack our bags tonight and check in "
           "online before we go to the airport."),
    "es": ("en este vídeo vamos a enseñarte cómo hacer pan en casa. gracias "
           "por ver el vídeo y no olvides suscribirte al canal. hoy vamos a "
           "hablar de la historia del mundo y de las personas que lo "
           "cambiaron. bienvenidos de nuevo a todos, esta es la segunda "
           "parte del tutorial. primero necesitamos mezclar la harina con "
           "el agua y después amasar la masa durante diez minutos. "
           "últimas noticias esta noche: los funcionarios confirmaron el "
           "acuerdo después de meses de negociaciones. el equipo local "
           "marcó dos goles en la segunda parte y ganó el partido. "
           "nuestro vuelo sale temprano por la mañana así que debemos "
           "hacer las maletas esta noche antes de ir al aeropuerto. "
           "bueno pues vale ahora sí vamos a ver esto un poquito más de "
           "cerca aquí abajo. deberías beber mucha agua y descansar bien "
           "cada noche me dice siempre mi abuela. sí claro también "
           "podemos añadir algo de azúcar si os gusta más dulce."),
    "fr": ("dans cette vidéo nous allons vous montrer comment faire du pain "
           "à la maison. merci d'avoir regardé et n'oubliez pas de vous "
           "abonner à la chaîne. aujourd'hui nous allons parler de "
           "l'histoire du monde et des gens qui l'ont changée. bienvenue à "
           "tous, voici la deuxième partie du tutoriel. d'abord il faut "
           "mélanger la farine avec l'eau puis pétrir la pâte. dernières "
           "nouvelles ce soir : les responsables ont confirmé l'accord "
           "après des mois de négociations. l'équipe locale a marqué deux "
           "buts en seconde période et a gagné le match. notre vol part "
           "tôt le matin donc il faut faire les valises ce soir avant "
           "d'aller à l'aéroport."),
    "de": ("in diesem video zeigen wir dir, wie man zu hause brot backt. "
           "danke fürs zuschauen und vergiss nicht, den kanal zu "
           "abonnieren. heute sprechen wir über die geschichte der welt und "
           "die menschen, die sie verändert haben. willkommen zurück, das "
           "ist der zweite teil des tutorials. zuerst müssen wir das mehl "
           "mit dem wasser mischen und den teig zehn minuten kneten. "
           "aktuelle nachrichten heute abend: die beamten bestätigten das "
           "abkommen nach monatelangen verhandlungen. die heimmannschaft "
           "erzielte in der zweiten halbzeit zwei tore und gewann das "
           "spiel. unser flug geht früh am morgen, also sollten wir heute "
           "abend packen, bevor wir zum flughafen fahren."),
    "pt": ("neste vídeo vamos mostrar como fazer pão em casa. obrigado por "
           "assistir e não se esqueça de se inscrever no canal. hoje vamos "
           "falar sobre a história do mundo e as pessoas que a mudaram. "
           "bem-vindos de volta, esta é a segunda parte do tutorial. "
           "primeiro precisamos misturar a farinha com a água e depois "
           "sovar a massa por dez minutos até ficar lisa. as informações "
           "não estão disponíveis em todas as regiões e também não temos "
           "uma previsão para amanhã. ontem à noite choveu muito no norte "
           "do país e as condições continuavam difíceis nas estradas. os "
           "senhores têm razão, melhores soluções virão com o tempo. "
           "notícias de última hora esta noite: os funcionários "
           "confirmaram o acordo após meses de negociações. o time da "
           "casa marcou dois gols no segundo tempo e venceu a partida. "
           "nosso voo sai cedo de manhã, então devemos arrumar as malas "
           "hoje à noite antes de ir ao aeroporto."),
    "it": ("in questo video vi mostreremo come fare il pane a casa. grazie "
           "per aver guardato e non dimenticate di iscrivervi al canale. "
           "oggi parleremo della storia del mondo e delle persone che "
           "l'hanno cambiata. bentornati a tutti, questa è la seconda parte "
           "del tutorial. prima dobbiamo mescolare la farina con l'acqua e "
           "poi impastare per dieci minuti finché non diventa liscia. "
           "ultime notizie questa sera: i funzionari hanno confermato "
           "l'accordo dopo mesi di trattative. la squadra di casa ha "
           "segnato due gol nel secondo tempo e ha vinto la partita. il "
           "nostro volo parte presto la mattina quindi dobbiamo fare le "
           "valigie stasera prima di andare all'aeroporto."),
    "nl": ("in deze video laten we je zien hoe je thuis brood bakt. bedankt "
           "voor het kijken en vergeet niet je te abonneren op het kanaal. "
           "vandaag praten we over de geschiedenis van de wereld en de "
           "mensen die haar veranderd hebben. welkom terug allemaal, dit is "
           "het tweede deel van de tutorial. eerst moeten we het meel met "
           "het water mengen en het deeg tien minuten kneden. laatste "
           "nieuws vanavond: de functionarissen bevestigden het akkoord "
           "na maanden van onderhandelingen. de thuisploeg scoorde twee "
           "keer in de tweede helft en won de wedstrijd. onze vlucht "
           "vertrekt vroeg in de ochtend dus we moeten vanavond inpakken "
           "voordat we naar het vliegveld gaan."),
    "sv": ("i den här videon visar vi dig hur man bakar bröd hemma. tack "
           "för att du tittade och glöm inte att prenumerera på kanalen. "
           "idag ska vi prata om världens historia och människorna som "
           "förändrade den. välkommen tillbaka allihopa, det här är den "
           "andra delen av handledningen. först måste vi blanda mjölet med "
           "vattnet och sedan knåda degen i tio minuter. senaste nytt i "
           "kväll: tjänstemännen bekräftade avtalet efter månader av "
           "förhandlingar. hemmalaget gjorde två mål i andra halvlek och "
           "vann matchen. vårt flyg avgår tidigt på morgonen så vi borde "
           "packa väskorna i kväll innan vi åker till flygplatsen."),
    "pl": ("w tym filmie pokażemy wam, jak upiec chleb w domu. dziękujemy "
           "za oglądanie i nie zapomnijcie zasubskrybować kanału. dzisiaj "
           "porozmawiamy o historii świata i ludziach, którzy ją zmienili. "
           "witajcie z powrotem, to druga część poradnika. najpierw musimy "
           "wymieszać mąkę z wodą, a potem wyrabiać ciasto przez dziesięć "
           "minut, aż będzie gładkie i elastyczne. wiadomości z ostatniej "
           "chwili: dziś wieczorem urzędnicy potwierdzili porozumienie po "
           "miesiącach negocjacji. gospodarze strzelili dwa gole w "
           "drugiej połowie i wygrali mecz. nasz samolot odlatuje "
           "wcześnie rano, więc powinniśmy spakować się dziś wieczorem "
           "zanim pojedziemy na lotnisko."),
    "cs": ("v tomto videu vám ukážeme, jak doma upéct chleba. děkujeme za "
           "zhlédnutí a nezapomeňte se přihlásit k odběru kanálu. dnes si "
           "povíme o historii světa a o lidech, kteří ji změnili. vítejte "
           "zpět, toto je druhá část návodu. nejprve musíme smíchat mouku s "
           "vodou a pak těsto deset minut hníst, dokud nebude hladké. "
           "včera večer hodně pršelo na severu země a podmínky na silnicích "
           "byly obtížné. nové zprávy přicházejí každý den a lidé čekají na "
           "další oznámení úřadů. příští týden bude přednáška o přírodě a "
           "počasí, která se uskuteční v našem městě. nejnovější zprávy: "
           "dnes večer úředníci potvrdili dohodu po měsících jednání. "
           "domácí tým vstřelil ve druhém poločase dva góly a vyhrál "
           "zápas. naše letadlo odlétá brzy ráno, takže bychom si měli "
           "sbalit věci dnes večer, než pojedeme na letiště."),
    "tr": ("bu videoda size evde nasıl ekmek yapılacağını göstereceğiz. "
           "izlediğiniz için teşekkürler ve kanala abone olmayı unutmayın. "
           "bugün dünyanın tarihi ve onu değiştiren insanlar hakkında "
           "konuşacağız. tekrar hoş geldiniz, bu eğitimin ikinci bölümü. "
           "önce unu suyla karıştırmamız ve hamuru on dakika yoğurmamız "
           "gerekiyor, ta ki pürüzsüz olana kadar. son dakika haberleri: "
           "bu akşam yetkililer aylar süren görüşmelerin ardından "
           "anlaşmayı doğruladı. ev sahibi takım ikinci yarıda iki gol "
           "atarak maçı kazandı. uçağımız sabah erken kalkıyor, bu yüzden "
           "havaalanına gitmeden önce bu akşam bavulları hazırlamalıyız."),
    "id": ("dalam video ini kami akan menunjukkan cara membuat roti di "
           "rumah. terima kasih sudah menonton dan jangan lupa berlangganan "
           "ke saluran ini. hari ini kita akan berbicara tentang sejarah "
           "dunia dan orang-orang yang mengubahnya. selamat datang kembali "
           "semuanya, ini adalah bagian kedua dari tutorial. pertama kita "
           "perlu mencampur tepung dengan air lalu menguleni adonan. "
           "berita terkini malam ini: para pejabat mengonfirmasi "
           "kesepakatan setelah berbulan-bulan perundingan. tim tuan "
           "rumah mencetak dua gol di babak kedua dan memenangkan "
           "pertandingan. penerbangan kami berangkat pagi-pagi sekali, "
           "jadi kita harus berkemas malam ini sebelum pergi ke bandara."),
    "vi": ("trong video này chúng tôi sẽ chỉ cho bạn cách làm bánh mì tại "
           "nhà. cảm ơn đã xem và đừng quên đăng ký kênh. hôm nay chúng ta "
           "sẽ nói về lịch sử thế giới và những người đã thay đổi nó. chào "
           "mừng trở lại, đây là phần thứ hai của bài hướng dẫn. đầu tiên "
           "chúng ta cần trộn bột với nước rồi nhào bột trong mười phút. "
           "tin mới nhất tối nay: các quan chức đã xác nhận thỏa thuận "
           "sau nhiều tháng đàm phán. đội chủ nhà ghi hai bàn trong hiệp "
           "hai và giành chiến thắng. chuyến bay của chúng ta khởi hành "
           "sớm vào buổi sáng nên chúng ta nên thu dọn hành lý tối nay "
           "trước khi ra sân bay."),
    "ru": ("в этом видео мы покажем вам, как испечь хлеб дома. спасибо за "
           "просмотр и не забудьте подписаться на канал. сегодня мы "
           "поговорим об истории мира и о людях, которые её изменили. "
           "добро пожаловать обратно, это вторая часть урока. сначала нам "
           "нужно смешать муку с водой, а затем месить тесто десять минут, "
           "пока оно не станет гладким и эластичным. последние новости: "
           "сегодня вечером чиновники подтвердили соглашение после "
           "месяцев переговоров. хозяева забили два гола во втором тайме "
           "и выиграли матч. наш рейс вылетает рано утром, поэтому нам "
           "стоит собрать вещи сегодня вечером, прежде чем ехать в "
           "аэропорт."),
    "uk": ("у цьому відео ми покажемо вам, як спекти хліб удома. дякуємо за "
           "перегляд і не забудьте підписатися на канал. сьогодні ми "
           "поговоримо про історію світу та людей, які її змінили. ласкаво "
           "просимо назад, це друга частина уроку. спочатку нам потрібно "
           "змішати борошно з водою, а потім місити тісто десять хвилин. "
           "останні новини: сьогодні ввечері чиновники підтвердили угоду "
           "після місяців переговорів. господарі забили два голи у "
           "другому таймі та виграли матч. наш рейс вилітає рано вранці, "
           "тому нам варто зібрати речі сьогодні ввечері, перш ніж їхати "
           "до аеропорту."),
    "ar": ("في هذا الفيديو سنريكم كيفية صنع الخبز في المنزل. شكرا للمشاهدة "
           "ولا تنسوا الاشتراك في القناة. اليوم سنتحدث عن تاريخ العالم "
           "والأشخاص الذين غيروه. مرحبا بكم من جديد، هذا هو الجزء الثاني من "
           "الدرس. أولا نحتاج إلى خلط الدقيق مع الماء ثم نعجن العجين لمدة "
           "عشر دقائق حتى يصبح ناعما ومرنا. آخر الأخبار هذا المساء: أكد "
           "المسؤولون الاتفاق بعد أشهر من المفاوضات. سجل الفريق المضيف "
           "هدفين في الشوط الثاني وفاز بالمباراة. تقلع رحلتنا باكرا في "
           "الصباح لذلك يجب أن نحزم الحقائب هذه الليلة قبل الذهاب إلى "
           "المطار."),
    "hi": ("इस वीडियो में हम आपको दिखाएंगे कि घर पर रोटी कैसे बनाई जाती है। देखने के "
           "लिए धन्यवाद और चैनल को सब्सक्राइब करना न भूलें। आज हम दुनिया के इतिहास और "
           "उसे बदलने वाले लोगों के बारे में बात करेंगे। वापस स्वागत है, यह पाठ का दूसरा "
           "भाग है। पहले हमें आटे को पानी के साथ मिलाना होगा। ताज़ा खबर: आज शाम "
           "अधिकारियों ने महीनों की बातचीत के बाद समझौते की पुष्टि की। मेज़बान टीम ने "
           "दूसरे हाफ में दो गोल किए और मैच जीत लिया। हमारी उड़ान सुबह जल्दी निकलती है "
           "इसलिए हमें हवाई अड्डे जाने से पहले आज रात सामान पैक कर लेना चाहिए।"),
    "ja": ("このビデオでは、家でパンを作る方法を紹介します。ご視聴ありがとうございます。チャンネル登録をお忘れなく。"
           "今日は世界の歴史とそれを変えた人々について話します。おかえりなさい、これはチュートリアルの第二部です。"
           "まず小麦粉と水を混ぜて、生地を十分間こねる必要があります。"
           "今夜の最新ニュースでは、数か月の交渉の末に当局者が合意を確認しました。"
           "ホームチームは後半に二点を決めて試合に勝ちました。"
           "私たちの飛行機は朝早く出発するので、空港へ行く前に今夜のうちに荷物をまとめたほうがいいです。"),
    "ko": ("이 영상에서는 집에서 빵을 만드는 방법을 보여드리겠습니다. 시청해 주셔서 감사합니다. "
           "채널 구독을 잊지 마세요. 오늘은 세계의 역사와 그것을 바꾼 사람들에 대해 이야기하겠습니다. "
           "다시 오신 것을 환영합니다. 먼저 밀가루와 물을 섞은 다음 반죽을 십 분 동안 치대야 합니다. "
           "오늘 밤 최신 뉴스에서는 수개월간의 협상 끝에 당국자들이 합의를 확인했습니다. "
           "홈 팀은 후반전에 두 골을 넣어 경기에서 이겼습니다. "
           "우리 비행기는 아침 일찍 출발하니까 공항에 가기 전에 오늘 밤에 짐을 싸 두는 것이 좋겠습니다."),
    "zh": ("在这个视频中我们将向你展示如何在家做面包。感谢观看，别忘了订阅频道。"
           "今天我们将讨论世界历史以及改变世界的人们。欢迎回来，这是教程的第二部分。"
           "首先我们需要把面粉和水混合，然后揉面团十分钟，直到它变得光滑。"
           "今晚的最新消息，经过数月的谈判，官员们确认了协议。"
           "主队在下半场打进两球，赢得了比赛。"
           "我们的航班明天一早起飞，所以今晚去机场之前应该收拾好行李。"),
}

_NGRAM_RANGE = (1, 2, 3)


def _ngrams(text: str) -> List[str]:
    t = " " + " ".join(text.lower().split()) + " "
    out: List[str] = []
    for n in _NGRAM_RANGE:
        out.extend(t[i:i + n] for i in range(len(t) - n + 1))
    return out


class _Profile:
    __slots__ = ("counts", "total")

    def __init__(self, text: str):
        self.counts = Counter(_ngrams(text))
        self.total = sum(self.counts.values())


_PROFILES: Dict[str, _Profile] = {
    lang: _Profile(text) for lang, text in _SEED_TEXT.items()
}
_VOCAB_SIZE = len(set().union(*[p.counts for p in _PROFILES.values()]))
_SMOOTH = 0.5


def detect_langs(text: str, top_k: int = 3) -> List[Tuple[str, float]]:
    """Ranked (language, posterior) like langdetect's ``detect_langs``.

    Per-n-gram average log-likelihood under each profile (uniform prior),
    softmax-normalized over languages. Deterministic, unlike langdetect's
    sampled trials."""
    grams = _ngrams(text)
    if not grams or not text.strip():
        return []
    scores: Dict[str, float] = {}
    for lang, prof in _PROFILES.items():
        denom = prof.total + _SMOOTH * _VOCAB_SIZE
        ll = sum(math.log((prof.counts.get(g, 0) + _SMOOTH) / denom)
                 for g in grams)
        scores[lang] = ll / len(grams)
    # softmax over per-gram average log-likelihoods
    m = max(scores.values())
    exp = {k: math.exp((v - m) * len(grams) ** 0.5) for k, v in scores.items()}
    z = sum(exp.values())
    ranked = sorted(((k, v / z) for k, v in exp.items()),
                    key=lambda kv: -kv[1])
    return ranked[:top_k]


def detect(text: str) -> str:
    """Single best language code (langdetect ``detect`` equivalent);
    raises ValueError on empty/whitespace text like langdetect does."""
    ranked = detect_langs(text)
    if not ranked:
        raise ValueError("No features in text.")
    return ranked[0][0]


def supported_languages() -> List[str]:
    return sorted(_PROFILES)
