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
the major European/Asian ASR languages; 30 languages over 10 scripts as of
round 5, incl. the hard da/no/sv and fa/ar pairs). Profiles are
deterministic (no langdetect-style random sampling), so detection is
reproducible.
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
           "online before we go to the airport. in a moment it costs "
           "nothing to get into the museum, so we can go inside and look "
           "at the exhibition. can you buy two kilos of potatoes and "
           "some meat at the butcher on the square while you are in town "
           "anyway. my watch broke last month and now i have to find a "
           "new one at a reasonable price. it takes about twenty minutes "
           "to walk down to the beach and the trip is well worth it on a "
           "warm summer day. my computer starts slowly so i clean up the "
           "hard drive and delete the old files. it is the best time to "
           "travel because there are the fewest tourists and prices are "
           "at their lowest. winter will be cold this year they say on "
           "the radio and maybe snow will arrive as early as november. "
           "remember to update the app on your phone and press the "
           "button below to subscribe; you will find the settings in the "
           "menu at the top right."),
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
           "podemos añadir algo de azúcar si os gusta más dulce. dentro "
           "de un momento la entrada al museo será gratuita, así que "
           "podremos entrar y ver la exposición. puedes comprar dos "
           "kilos de patatas y un poco de carne en la carnicería de la "
           "plaza ya que estás en la ciudad de todos modos. mi reloj se "
           "rompió el mes pasado y ahora tengo que encontrar uno nuevo a "
           "un precio razonable. se tarda unos veinte minutos en bajar "
           "andando a la playa y el paseo merece la pena en un día "
           "caluroso de verano. mi ordenador arranca lento así que "
           "limpio el disco duro y borro los archivos viejos. es la "
           "mejor época para viajar porque hay menos turistas y los "
           "precios están más bajos. el invierno será frío este año "
           "dicen en la radio y puede que la nieve llegue ya en "
           "noviembre. acuérdate de actualizar la aplicación en tu "
           "móvil y pulsa el botón de abajo para suscribirte; "
           "encontrarás los ajustes en el menú arriba a la derecha."),
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
           "d'aller à l'aéroport. dans un instant l'entrée du musée sera "
           "gratuite, donc nous pourrons entrer et regarder l'exposition. "
           "peux-tu acheter deux kilos de pommes de terre et un peu de "
           "viande chez le boucher sur la place puisque tu es en ville "
           "de toute façon. ma montre s'est cassée le mois dernier et "
           "maintenant je dois en trouver une nouvelle à un prix "
           "raisonnable. il faut environ vingt minutes pour descendre à "
           "la plage à pied et la promenade en vaut la peine par une "
           "chaude journée d'été. mon ordinateur démarre lentement alors "
           "je nettoie le disque dur et je supprime les vieux fichiers. "
           "c'est la meilleure période pour voyager car il y a le moins "
           "de touristes et les prix sont au plus bas. l'hiver sera "
           "froid cette année disent-ils à la radio et la neige arrivera "
           "peut-être dès novembre. pense à mettre à jour l'application "
           "sur ton téléphone et appuie sur le bouton ci-dessous pour "
           "t'abonner ; tu trouveras les réglages dans le menu en haut "
           "à droite."),
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
           "abend packen, bevor wir zum flughafen fahren. gleich kostet "
           "es nichts mehr ins museum zu kommen, also können wir "
           "hineingehen und uns die ausstellung ansehen. kannst du zwei "
           "kilo kartoffeln und etwas fleisch beim metzger am markt "
           "kaufen, wenn du sowieso in der stadt bist. meine uhr ist "
           "letzten monat kaputt gegangen und jetzt muss ich eine neue "
           "zu einem vernünftigen preis finden. es dauert ungefähr "
           "zwanzig minuten zum strand hinunterzugehen und der ausflug "
           "lohnt sich an einem warmen sommertag. mein computer startet "
           "langsam also räume ich die festplatte auf und lösche die "
           "alten dateien. es ist die beste reisezeit denn es gibt die "
           "wenigsten touristen und die preise sind am niedrigsten. der "
           "winter wird dieses jahr kalt sagen sie im radio und "
           "vielleicht kommt schon im november schnee. denk daran die "
           "app auf deinem handy zu aktualisieren und drücke den knopf "
           "unten um zu abonnieren; die einstellungen findest du im "
           "menü oben rechts."),
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
           "hoje à noite antes de ir ao aeroporto. daqui a pouco a "
           "entrada no museu será gratuita, então poderemos entrar e ver "
           "a exposição. você pode comprar dois quilos de batatas e um "
           "pouco de carne no açougue da praça já que está na cidade de "
           "qualquer forma. meu relógio quebrou no mês passado e agora "
           "preciso encontrar um novo por um preço razoável. leva cerca "
           "de vinte minutos para descer a pé até a praia e o passeio "
           "vale a pena num dia quente de verão. meu computador liga "
           "devagar então eu limpo o disco rígido e apago os arquivos "
           "antigos. é a melhor época para viajar porque há menos "
           "turistas e os preços estão mais baixos. o inverno será frio "
           "este ano dizem no rádio e talvez a neve chegue já em "
           "novembro. lembre-se de atualizar o aplicativo no seu celular "
           "e aperte o botão abaixo para se inscrever; você encontra as "
           "configurações no menu no canto superior direito."),
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
           "valigie stasera prima di andare all'aeroporto. tra poco "
           "l'ingresso al museo sarà gratuito, quindi potremo entrare e "
           "vedere la mostra. puoi comprare due chili di patate e un po' "
           "di carne dal macellaio in piazza visto che sei comunque in "
           "città. il mio orologio si è rotto il mese scorso e adesso "
           "devo trovarne uno nuovo a un prezzo ragionevole. ci vogliono "
           "circa venti minuti per scendere a piedi alla spiaggia e la "
           "passeggiata ne vale la pena in una calda giornata d'estate. "
           "il mio computer si avvia lentamente quindi pulisco il disco "
           "e cancello i vecchi file. è il periodo migliore per "
           "viaggiare perché ci sono meno turisti e i prezzi sono più "
           "bassi. l'inverno sarà freddo quest'anno dicono alla radio e "
           "forse la neve arriverà già a novembre. ricordati di "
           "aggiornare l'applicazione sul telefono e premi il pulsante "
           "qui sotto per iscriverti; troverai le impostazioni nel menu "
           "in alto a destra."),
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
           "voordat we naar het vliegveld gaan. zo meteen kost het niets "
           "om het museum binnen te komen, dus we kunnen naar binnen "
           "gaan en de tentoonstelling bekijken. kun je twee kilo "
           "aardappelen en wat vlees kopen bij de slager op het plein "
           "als je toch in de stad bent. mijn horloge ging vorige maand "
           "kapot en nu moet ik een nieuwe vinden voor een redelijke "
           "prijs. het duurt ongeveer twintig minuten om naar het strand "
           "te lopen en het uitje is het helemaal waard op een warme "
           "zomerdag. mijn computer start langzaam dus ik ruim de harde "
           "schijf op en verwijder de oude bestanden. het is de beste "
           "tijd om te reizen want er zijn de minste toeristen en de "
           "prijzen zijn het laagst. de winter wordt koud dit jaar "
           "zeggen ze op de radio en misschien valt er al sneeuw in "
           "november. vergeet niet de app op je telefoon bij te werken "
           "en druk op de knop hieronder om je te abonneren; de "
           "instellingen vind je in het menu rechtsboven."),
    "sv": ("i den här videon visar vi dig hur man bakar bröd hemma. tack "
           "för att du tittade och glöm inte att prenumerera på kanalen. "
           "idag ska vi prata om världens historia och människorna som "
           "förändrade den. välkommen tillbaka allihopa, det här är den "
           "andra delen av handledningen. först måste vi blanda mjölet med "
           "vattnet och sedan knåda degen i tio minuter. senaste nytt i "
           "kväll: tjänstemännen bekräftade avtalet efter månader av "
           "förhandlingar. hemmalaget gjorde två mål i andra halvlek och "
           "vann matchen. vårt flyg avgår tidigt på morgonen så vi borde "
           "packa väskorna i kväll innan vi åker till flygplatsen. och nu "
           "ska vi titta närmare på hur det fungerar i praktiken. jag "
           "tycker att det är väldigt viktigt att man inte glömmer bort "
           "att vila mellan passen. under veckan kommer vädret att växla "
           "mellan sol och regn, och på torsdag blir det blåsigt längs "
           "kusten. han sade att de skulle åka till stugan över helgen "
           "för att fiska och plocka svamp. priserna på el har stigit "
           "kraftigt i södra sverige den här vintern. många människor "
           "väljer att cykla till jobbet eftersom det både är billigare "
           "och bättre för miljön. om en stund kostar det ingenting att "
           "komma in på museet, så vi kan gå in och titta på "
           "utställningen. kan du köpa två kilo potatis och lite kött "
           "hos slaktaren på torget när du ändå är i stan. min klocka "
           "gick sönder förra månaden och nu måste jag hitta en ny till "
           "ett rimligt pris. det tar ungefär tjugo minuter att gå ner "
           "till stranden och turen är väl värd det en varm sommardag. "
           "min dator startar långsamt så jag rensar hårddisken och tar "
           "bort de gamla filerna. det är den bästa tiden att resa, för "
           "då är det minst turister och priserna är som lägst. vintern "
           "blir kall i år, säger de i radion, och det kommer kanske "
           "snö redan i november. tryck på knappen nedanför för att "
           "prenumerera, och glöm inte att uppdatera appen i "
           "inställningarna uppe till höger."),
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
    "ro": ("în acest videoclip vă vom arăta cum să faceți pâine acasă. "
           "mulțumim pentru vizionare și nu uitați să vă abonați la canal. "
           "astăzi vom vorbi despre istoria lumii și despre oamenii care au "
           "schimbat-o. bine ați revenit, aceasta este a doua parte a "
           "tutorialului. mai întâi trebuie să amestecăm făina cu apa și "
           "apoi să frământăm aluatul timp de zece minute până devine "
           "neted. ultimele știri din această seară: oficialii au "
           "confirmat acordul după luni de negocieri. echipa gazdă a "
           "marcat două goluri în repriza a doua și a câștigat meciul. "
           "zborul nostru pleacă dimineața devreme, așa că ar trebui să ne "
           "facem bagajele în seara asta înainte să mergem la aeroport."),
    "hu": ("ebben a videóban megmutatjuk, hogyan süthetsz kenyeret otthon. "
           "köszönjük, hogy megnézted, és ne felejts el feliratkozni a "
           "csatornára. ma a világ történelméről fogunk beszélni és azokról "
           "az emberekről, akik megváltoztatták. üdvözlünk újra mindenkit, "
           "ez az útmutató második része. először össze kell kevernünk a "
           "lisztet a vízzel, majd tíz percig dagasztjuk a tésztát, amíg "
           "sima nem lesz. friss hírek ma este: a tisztviselők hónapokig "
           "tartó tárgyalások után megerősítették a megállapodást. a hazai "
           "csapat két gólt szerzett a második félidőben és megnyerte a "
           "meccset. a gépünk kora reggel indul, ezért ma este össze "
           "kellene csomagolnunk, mielőtt kimegyünk a repülőtérre."),
    "fi": ("tässä videossa näytämme, miten leipä leivotaan kotona. kiitos "
           "katsomisesta, äläkä unohda tilata kanavaa. tänään puhumme "
           "maailman historiasta ja ihmisistä, jotka muuttivat sitä. "
           "tervetuloa takaisin kaikki, tämä on opetusohjelman toinen osa. "
           "ensin meidän täytyy sekoittaa jauhot veteen ja sitten vaivata "
           "taikinaa kymmenen minuuttia, kunnes se on sileää. illan "
           "tuoreimmat uutiset: viranomaiset vahvistivat sopimuksen "
           "kuukausien neuvottelujen jälkeen. kotijoukkue teki kaksi "
           "maalia toisella puoliajalla ja voitti ottelun. lentomme "
           "lähtee aikaisin aamulla, joten meidän pitäisi pakata laukut "
           "tänä iltana ennen kuin lähdemme lentokentälle."),
    "da": ("i denne video viser vi jer, hvordan man bager brød derhjemme. "
           "tak fordi i så med, og glem ikke at abonnere på kanalen. i dag "
           "skal vi tale om verdens historie og de mennesker, der ændrede "
           "den. velkommen tilbage allesammen, det her er anden del af "
           "vejledningen. først skal vi blande melet med vandet og "
           "derefter ælte dejen i ti minutter, indtil den er glat. sidste "
           "nyt i aften: embedsmændene bekræftede aftalen efter måneders "
           "forhandlinger. hjemmeholdet scorede to mål i anden halvleg og "
           "vandt kampen. vores fly afgår tidligt om morgenen, så vi bør "
           "pakke kufferterne i aften, inden vi tager ud til lufthavnen. "
           "hvad synes du selv, skal vi prøve igen i næste uge efter "
           "arbejde, eller venter vi til om søndagen hos mig. og nu skal "
           "vi kigge nærmere på hvordan det fungerer i praksis. jeg "
           "synes at det er meget vigtigt at man ikke glemmer at hvile "
           "mellem øvelserne. i løbet af ugen veksler vejret mellem sol "
           "og regn, og torsdag bliver det blæsende langs kysten. han "
           "sagde at de ville tage ud til sommerhuset i weekenden for at "
           "fiske og samle svampe. priserne på el er steget kraftigt i "
           "det sydlige danmark denne vinter. mange mennesker vælger at "
           "cykle på arbejde fordi det både er billigere og bedre for "
           "miljøet. om lidt koster det ikke noget at komme ind på "
           "museet, så vi kan gå derind og kigge på udstillingen. kan du "
           "købe to kilo kartofler og lidt kød hos slagteren på torvet, "
           "når du alligevel er i byen. mit ur gik i stykker i sidste "
           "måned, og nu skal jeg finde et nyt til en fornuftig pris. "
           "det tager cirka tyve minutter at gå ned til stranden, og "
           "turen er det hele værd en varm sommerdag. min computer "
           "starter langsomt, så jeg rydder op på harddisken og sletter "
           "de gamle filer. det er det bedste tidspunkt at rejse på, for "
           "der er færrest turister og priserne er lavest. vinteren "
           "bliver kold i år, siger de i radioen, og der kommer måske "
           "sne allerede i november. husk at opdatere appen på din "
           "telefon, og tryk på knappen nedenunder for at abonnere; "
           "indstillingerne finder du i menuen øverst til højre."),
    "no": ("i denne videoen viser vi dere hvordan man baker brød hjemme. "
           "takk for at dere så på, og ikke glem å abonnere på kanalen. i "
           "dag skal vi snakke om verdens historie og menneskene som "
           "forandret den. velkommen tilbake alle sammen, dette er andre "
           "del av veiledningen. først må vi blande melet med vannet og "
           "deretter elte deigen i ti minutter til den er glatt. siste "
           "nytt i kveld: tjenestemennene bekreftet avtalen etter måneder "
           "med forhandlinger. hjemmelaget scoret to mål i andre omgang "
           "og vant kampen. flyet vårt drar tidlig om morgenen, så vi "
           "burde pakke koffertene i kveld før vi drar til flyplassen. "
           "hva synes du selv, skal vi prøve igjen neste uke etter jobb, "
           "eller venter vi til søndag hjemme hos meg. og nå skal vi se "
           "nærmere på hvordan det fungerer i praksis. jeg synes det er "
           "veldig viktig at man ikke glemmer å hvile mellom øktene. i "
           "løpet av uken veksler været mellom sol og regn, og torsdag "
           "blir det mye vind langs kysten. han sa at de skulle dra på "
           "hytta i helgen for å fiske og plukke sopp. strømprisene har "
           "steget kraftig i sør-norge denne vinteren. mange velger å "
           "sykle til jobben fordi det både er billigere og bedre for "
           "miljøet. om litt koster det ingenting å komme inn på museet, "
           "så vi kan gå inn og se på utstillingen. kan du kjøpe to kilo "
           "poteter og litt kjøtt hos slakteren på torget når du likevel "
           "er i byen. klokka mi gikk i stykker forrige måned, og nå må "
           "jeg finne en ny til en fornuftig pris. det tar omtrent tjue "
           "minutter å gå ned til stranden, og turen er vel verdt det en "
           "varm sommerdag. datamaskinen min starter sakte, så jeg "
           "rydder opp på harddisken og sletter de gamle filene. det er "
           "den beste tiden å reise på, for da er det færrest turister "
           "og prisene er lavest. vinteren blir kald i år, sier de på "
           "radioen, og det kommer kanskje snø allerede i november. husk "
           "å oppdatere appen på telefonen din, og trykk på knappen "
           "nedenfor for å abonnere; innstillingene finner du i menyen "
           "øverst til høyre."),
    "el": ("σε αυτό το βίντεο θα σας δείξουμε πώς να φτιάξετε ψωμί στο "
           "σπίτι. ευχαριστούμε που παρακολουθήσατε και μην ξεχάσετε να "
           "κάνετε εγγραφή στο κανάλι. σήμερα θα μιλήσουμε για την ιστορία "
           "του κόσμου και τους ανθρώπους που την άλλαξαν. καλώς ήρθατε "
           "ξανά, αυτό είναι το δεύτερο μέρος του οδηγού. πρώτα πρέπει να "
           "ανακατέψουμε το αλεύρι με το νερό και μετά να ζυμώσουμε τη "
           "ζύμη για δέκα λεπτά. τελευταία νέα απόψε: οι αξιωματούχοι "
           "επιβεβαίωσαν τη συμφωνία μετά από μήνες διαπραγματεύσεων. η "
           "γηπεδούχος ομάδα σκόραρε δύο γκολ στο δεύτερο ημίχρονο και "
           "κέρδισε τον αγώνα. η πτήση μας φεύγει νωρίς το πρωί, οπότε θα "
           "πρέπει να ετοιμάσουμε τις βαλίτσες απόψε πριν πάμε στο "
           "αεροδρόμιο."),
    "he": ("בסרטון הזה נראה לכם איך להכין לחם בבית. תודה שצפיתם ואל תשכחו "
           "להירשם לערוץ. היום נדבר על ההיסטוריה של העולם ועל האנשים "
           "ששינו אותה. ברוכים השבים כולם, זה החלק השני של המדריך. קודם "
           "צריך לערבב את הקמח עם המים ואז ללוש את הבצק עשר דקות עד "
           "שהוא חלק. חדשות אחרונות הערב: הפקידים אישרו את ההסכם אחרי "
           "חודשים של משא ומתן. הקבוצה המארחת כבשה שני שערים במחצית "
           "השנייה וניצחה במשחק. הטיסה שלנו יוצאת מוקדם בבוקר, אז כדאי "
           "שנארוז את המזוודות הערב לפני שניסע לשדה התעופה."),
    "fa": ("در این ویدیو به شما نشان می‌دهیم که چگونه در خانه نان بپزید. "
           "ممنون که تماشا کردید و فراموش نکنید که در کانال عضو شوید. "
           "امروز درباره تاریخ جهان و مردمی که آن را تغییر دادند صحبت "
           "خواهیم کرد. خوش آمدید، این قسمت دوم آموزش است. ابتدا باید آرد "
           "را با آب مخلوط کنیم و سپس خمیر را ده دقیقه ورز دهیم تا صاف "
           "شود. آخرین خبرهای امشب: مقامات پس از ماه‌ها مذاکره توافق را "
           "تأیید کردند. تیم میزبان در نیمه دوم دو گل زد و بازی را برد. "
           "پرواز ما صبح زود حرکت می‌کند، بنابراین باید امشب چمدان‌ها را "
           "ببندیم پیش از اینکه به فرودگاه برویم."),
    "th": ("ในวิดีโอนี้เราจะแสดงให้คุณดูว่าทำขนมปังที่บ้านอย่างไร "
           "ขอบคุณที่รับชมและอย่าลืมกดติดตามช่องของเรา "
           "วันนี้เราจะพูดถึงประวัติศาสตร์ของโลกและผู้คนที่เปลี่ยนแปลงมัน "
           "ยินดีต้อนรับกลับมาทุกคน นี่คือส่วนที่สองของบทเรียน "
           "ก่อนอื่นเราต้องผสมแป้งกับน้ำแล้วนวดแป้งสิบนาทีจนเนียน "
           "ข่าวล่าสุดคืนนี้ เจ้าหน้าที่ยืนยันข้อตกลงหลังจากการเจรจานานหลายเดือน "
           "ทีมเจ้าบ้านยิงสองประตูในครึ่งหลังและชนะการแข่งขัน "
           "เที่ยวบินของเราออกแต่เช้า ดังนั้นเราควรเก็บกระเป๋าคืนนี้ก่อนไปสนามบิน"),
    "bn": ("এই ভিডিওতে আমরা আপনাকে দেখাব কীভাবে বাড়িতে রুটি বানাতে হয়। "
           "দেখার জন্য ধন্যবাদ এবং চ্যানেলটি সাবস্ক্রাইব করতে ভুলবেন না। "
           "আজ আমরা বিশ্বের ইতিহাস এবং যারা এটি বদলে দিয়েছেন তাদের নিয়ে কথা বলব। "
           "আবার স্বাগতম সবাইকে, এটি টিউটোরিয়ালের দ্বিতীয় অংশ। "
           "প্রথমে আমাদের ময়দার সঙ্গে পানি মেশাতে হবে এবং তারপর দশ মিনিট ধরে খামির মাখতে হবে। "
           "আজ রাতের সর্বশেষ খবর: কয়েক মাসের আলোচনার পর কর্মকর্তারা চুক্তিটি নিশ্চিত করেছেন। "
           "স্বাগতিক দল দ্বিতীয়ার্ধে দুটি গোল করে ম্যাচটি জিতেছে। "
           "আমাদের ফ্লাইট খুব ভোরে ছাড়ে, তাই বিমানবন্দরে যাওয়ার আগে আজ রাতেই ব্যাগ গুছিয়ে নেওয়া উচিত।"),
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
# Jelinek-Mercer interpolation weight: p(g|lang) mixes the profile's
# n-gram FREQUENCY with a uniform floor. Frequencies (not raw counts)
# keep the model invariant to seed-corpus length — additive smoothing
# with the global vocab in the denominator made longer seeds win on any
# shared gram once the 30-language union vocab dwarfed profile totals.
_LAMBDA = 0.98


def detect_langs(text: str, top_k: int = 3) -> List[Tuple[str, float]]:
    """Ranked (language, posterior) like langdetect's ``detect_langs``.

    Per-n-gram average log-likelihood under each profile (uniform prior),
    softmax-normalized over languages. Deterministic, unlike langdetect's
    sampled trials."""
    grams = _ngrams(text)
    if not grams or not text.strip():
        return []
    floor = (1.0 - _LAMBDA) / _VOCAB_SIZE
    scores: Dict[str, float] = {}
    for lang, prof in _PROFILES.items():
        ll = sum(math.log(_LAMBDA * prof.counts.get(g, 0) / prof.total
                          + floor)
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
