"""Model-grade language ID + GenBit-style gender metrics (VERDICT r2 #7).

langdetect/genbit are not installable in this environment, so the agreement
fixture is held-out text per language (different register and vocabulary
from the seed corpora langid trains on at import): the detector must
classify every one correctly, which a lexicon heuristic cannot do across
30 languages/10 scripts (incl. the hard da/no/sv and fa/ar pairs). GenBit checks pin the metric semantics:
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
    "ro": "guvernul a anunțat ieri noi măsuri în timp ce ploile puternice "
          "au continuat în regiunile din nordul țării",
    "hu": "a kormány tegnap új intézkedéseket jelentett be miközben az "
          "ország északi részein tovább esett a heves eső",
    "fi": "hallitus ilmoitti eilen uusista toimista kun rankkasateet "
          "jatkuivat maan pohjoisosissa",
    "da": "regeringen meddelte i går nye tiltag mens kraftig regn "
          "fortsatte i de nordlige dele af landet",
    "no": "regjeringen kunngjorde i går nye tiltak mens kraftig regn "
          "fortsatte i de nordlige delene av landet",
    "el": "η κυβέρνηση ανακοίνωσε χθες νέα μέτρα ενώ οι ισχυρές βροχές "
          "συνεχίστηκαν στις βόρειες περιοχές της χώρας",
    "he": "הממשלה הודיעה אתמול על צעדים חדשים בעוד גשם כבד נמשך באזורים "
          "הצפוניים של המדינה",
    "fa": "دولت دیروز اقدامات جدیدی را اعلام کرد در حالی که باران شدید در "
          "مناطق شمالی کشور ادامه داشت",
    "th": "รัฐบาลประกาศมาตรการใหม่เมื่อวานนี้ขณะที่ฝนตกหนักยังคงดำเนินต่อไปในภาคเหนือของประเทศ",
    "bn": "সরকার গতকাল নতুন পদক্ষেপ ঘোষণা করেছে যখন দেশের উত্তরাঞ্চলে ভারী "
          "বৃষ্টি অব্যাহত ছিল",
}


# Round-4 broadened fixture (VERDICT r3 weak #6): per language, the original
# news/weather sentence plus nine more held-out texts across registers —
# cooking, sports (tennis, disjoint from the seeds' football), tech, travel
# (train, disjoint from the seeds' flight), health, finance, casual — and two
# SHORT NOISY ASR-LIKE strings (fillers, no punctuation), none sharing
# sentences with the seed corpora langid trains on.
HELD_OUT_MULTI = {
    "en": [
        HELD_OUT["en"],
        "chop the onions finely and fry them in olive oil until golden then add the garlic and stir for another minute",
        "she hit a backhand winner down the line and the crowd rose to its feet as the final set came to an end",
        "restart your phone open the settings menu and install the latest software update before you connect the printer",
        "the train to the old town leaves from platform nine and a return ticket costs about fifteen euros per person",
        "my doctor recommended drinking more water sleeping eight hours and taking a short walk every single day",
        "prices rose again this quarter while the central bank kept interest rates unchanged despite growing inflation",
        "honestly i was not expecting that ending we laughed so hard that the neighbours probably heard us through the wall",
        "uh yeah so basically you just press this little button right here",
        "okay um let's see maybe we add a bit of salt and pepper now",
    ],
    "es": [
        HELD_OUT["es"],
        "pica las cebollas finamente y fríelas en aceite de oliva hasta que estén doradas luego añade el ajo y remueve un minuto más",
        "ella conectó un revés ganador paralelo y el público se puso de pie cuando terminó el último set",
        "reinicia tu teléfono abre el menú de ajustes e instala la última actualización antes de conectar la impresora",
        "el tren al casco antiguo sale del andén nueve y un billete de ida y vuelta cuesta unos quince euros por persona",
        "mi médico me recomendó beber más agua dormir ocho horas y dar un paseo corto todos los días",
        "los precios subieron otra vez este trimestre mientras el banco central mantuvo los tipos de interés sin cambios pese a la inflación",
        "la verdad no me esperaba ese final nos reímos tanto que seguramente los vecinos nos oyeron a través de la pared",
        "eh sí bueno básicamente solo aprietas este botoncito de aquí",
        "vale eh a ver quizá ahora le echamos un poco de sal y pimienta",
    ],
    "fr": [
        HELD_OUT["fr"],
        "émincez finement les oignons et faites-les revenir dans l'huile d'olive jusqu'à ce qu'ils soient dorés puis ajoutez l'ail et remuez encore une minute",
        "elle a réussi un revers gagnant le long de la ligne et le public s'est levé à la fin du dernier set",
        "redémarre ton téléphone ouvre le menu des réglages et installe la dernière mise à jour avant de brancher l'imprimante",
        "le train pour la vieille ville part du quai neuf et un aller-retour coûte environ quinze euros par personne",
        "mon médecin m'a conseillé de boire plus d'eau de dormir huit heures et de faire une petite promenade chaque jour",
        "les prix ont encore augmenté ce trimestre tandis que la banque centrale a maintenu ses taux d'intérêt malgré l'inflation",
        "franchement je ne m'attendais pas à cette fin on a tellement ri que les voisins nous ont sûrement entendus à travers le mur",
        "euh ouais donc en gros tu appuies juste sur ce petit bouton là",
        "bon euh voyons on ajoute peut-être un peu de sel et de poivre maintenant",
    ],
    "de": [
        HELD_OUT["de"],
        "schneide die zwiebeln fein und brate sie in olivenöl goldbraun an dann gib den knoblauch dazu und rühre noch eine minute",
        "sie schlug einen rückhand-gewinner die linie entlang und das publikum stand auf als der letzte satz zu ende ging",
        "starte dein handy neu öffne das einstellungsmenü und installiere das neueste update bevor du den drucker anschließt",
        "der zug in die altstadt fährt von gleis neun ab und eine rückfahrkarte kostet etwa fünfzehn euro pro person",
        "mein arzt hat mir empfohlen mehr wasser zu trinken acht stunden zu schlafen und jeden tag einen kurzen spaziergang zu machen",
        "die preise stiegen in diesem quartal erneut während die zentralbank die zinsen trotz der inflation unverändert ließ",
        "ehrlich gesagt habe ich dieses ende nicht erwartet wir haben so laut gelacht dass die nachbarn uns bestimmt durch die wand gehört haben",
        "äh ja also im grunde drückst du einfach auf diesen kleinen knopf hier",
        "okay ähm mal sehen vielleicht geben wir jetzt etwas salz und pfeffer dazu",
    ],
    "pt": [
        HELD_OUT["pt"],
        "pique as cebolas finamente e frite-as no azeite até ficarem douradas depois acrescente o alho e mexa por mais um minuto",
        "ela acertou um backhand vencedor na linha e a plateia se levantou quando o último set chegou ao fim",
        "reinicie o seu celular abra o menu de configurações e instale a atualização mais recente antes de conectar a impressora",
        "o trem para a cidade velha parte da plataforma nove e uma passagem de ida e volta custa cerca de quinze euros por pessoa",
        "o meu médico recomendou beber mais água dormir oito horas e fazer uma caminhada curta todos os dias",
        "os preços subiram de novo neste trimestre enquanto o banco central manteve os juros inalterados apesar da inflação",
        "sinceramente eu não esperava aquele final rimos tanto que os vizinhos com certeza nos ouviram através da parede",
        "é pois basicamente você só aperta esse botãozinho aqui",
        "tá bom deixa eu ver talvez a gente coloque um pouco de sal e pimenta agora",
    ],
    "it": [
        HELD_OUT["it"],
        "trita finemente le cipolle e falle soffriggere nell'olio d'oliva finché non sono dorate poi aggiungi l'aglio e mescola ancora un minuto",
        "lei ha piazzato un rovescio vincente lungolinea e il pubblico si è alzato in piedi alla fine dell'ultimo set",
        "riavvia il telefono apri il menu delle impostazioni e installa l'ultimo aggiornamento prima di collegare la stampante",
        "il treno per il centro storico parte dal binario nove e un biglietto di andata e ritorno costa circa quindici euro a persona",
        "il mio medico mi ha consigliato di bere più acqua dormire otto ore e fare una breve passeggiata ogni giorno",
        "i prezzi sono saliti di nuovo questo trimestre mentre la banca centrale ha lasciato i tassi di interesse invariati nonostante l'inflazione",
        "sinceramente non mi aspettavo quel finale abbiamo riso così tanto che i vicini ci avranno sentito attraverso il muro",
        "eh sì insomma praticamente basta premere questo pulsantino qui",
        "ok allora vediamo magari adesso aggiungiamo un po' di sale e pepe",
    ],
    "nl": [
        HELD_OUT["nl"],
        "snijd de uien fijn en bak ze in olijfolie tot ze goudbruin zijn voeg dan de knoflook toe en roer nog een minuut",
        "ze sloeg een backhand winner langs de lijn en het publiek ging staan toen de laatste set ten einde liep",
        "herstart je telefoon open het instellingenmenu en installeer de nieuwste update voordat je de printer aansluit",
        "de trein naar de oude stad vertrekt van spoor negen en een retourtje kost ongeveer vijftien euro per persoon",
        "mijn huisarts raadde me aan meer water te drinken acht uur te slapen en elke dag een korte wandeling te maken",
        "de prijzen stegen dit kwartaal opnieuw terwijl de centrale bank de rente ondanks de inflatie ongewijzigd liet",
        "eerlijk gezegd had ik dat einde niet verwacht we moesten zo hard lachen dat de buren ons vast door de muur hoorden",
        "uh ja dus eigenlijk druk je gewoon op dit knopje hier",
        "oké eh even kijken misschien doen we er nu wat zout en peper bij",
    ],
    "sv": [
        HELD_OUT["sv"],
        "hacka löken fint och stek den i olivolja tills den är gyllene tillsätt sedan vitlöken och rör om en minut till",
        "hon slog en backhandvinnare längs linjen och publiken reste sig när det sista setet tog slut",
        "starta om din telefon öppna inställningsmenyn och installera den senaste uppdateringen innan du ansluter skrivaren",
        "tåget till gamla stan avgår från spår nio och en tur och retur-biljett kostar ungefär femton euro per person",
        "min läkare rekommenderade att dricka mer vatten sova åtta timmar och ta en kort promenad varje dag",
        "priserna steg igen det här kvartalet medan centralbanken lämnade räntan oförändrad trots inflationen",
        "ärligt talat väntade jag mig inte det slutet vi skrattade så mycket att grannarna säkert hörde oss genom väggen",
        "eh ja alltså i princip trycker du bara på den här lilla knappen här",
        "okej hm få se kanske vi tillsätter lite salt och peppar nu",
    ],
    "pl": [
        HELD_OUT["pl"],
        "posiekaj drobno cebulę i podsmaż ją na oliwie aż się zezłoci potem dodaj czosnek i mieszaj jeszcze minutę",
        "ona zagrała wygrywającego bekhenda wzdłuż linii a publiczność wstała gdy ostatni set dobiegł końca",
        "uruchom ponownie telefon otwórz menu ustawień i zainstaluj najnowszą aktualizację zanim podłączysz drukarkę",
        "pociąg na stare miasto odjeżdża z peronu dziewiątego a bilet powrotny kosztuje około piętnastu euro od osoby",
        "mój lekarz zalecił mi pić więcej wody spać osiem godzin i codziennie chodzić na krótki spacer",
        "ceny znów wzrosły w tym kwartale podczas gdy bank centralny pozostawił stopy procentowe bez zmian mimo inflacji",
        "szczerze mówiąc nie spodziewałem się takiego zakończenia śmialiśmy się tak głośno że sąsiedzi na pewno nas słyszeli przez ścianę",
        "no tak więc w zasadzie po prostu naciskasz ten mały przycisk tutaj",
        "dobra hm zobaczmy może teraz dodamy trochę soli i pieprzu",
    ],
    "cs": [
        HELD_OUT["cs"],
        "nakrájej cibuli najemno a osmaž ji na olivovém oleji dozlatova pak přidej česnek a míchej ještě minutu",
        "zahrála vítězný bekhend podél lajny a diváci vstali když poslední set skončil",
        "restartuj telefon otevři nabídku nastavení a nainstaluj nejnovější aktualizaci než připojíš tiskárnu",
        "vlak do starého města odjíždí z deváté koleje a zpáteční jízdenka stojí asi patnáct eur na osobu",
        "můj lékař mi doporučil pít více vody spát osm hodin a každý den si udělat krátkou procházku",
        "ceny v tomto čtvrtletí opět vzrostly zatímco centrální banka navzdory inflaci ponechala úrokové sazby beze změny",
        "upřímně jsem takový konec nečekal smáli jsme se tak nahlas že nás sousedé určitě slyšeli přes zeď",
        "no jo takže v podstatě prostě zmáčkneš tohle malé tlačítko tady",
        "tak jo hm uvidíme možná teď přidáme trochu soli a pepře",
    ],
    "tr": [
        HELD_OUT["tr"],
        "soğanları ince ince doğra ve zeytinyağında altın rengi alana kadar kavur sonra sarımsağı ekle ve bir dakika daha karıştır",
        "çizgiye paralel kazandıran bir backhand vurdu ve son set sona ererken seyirciler ayağa kalktı",
        "telefonunu yeniden başlat ayarlar menüsünü aç ve yazıcıyı bağlamadan önce en son güncellemeyi yükle",
        "eski şehre giden tren dokuzuncu perondan kalkıyor ve gidiş dönüş bilet kişi başı yaklaşık on beş euro tutuyor",
        "doktorum daha fazla su içmemi sekiz saat uyumamı ve her gün kısa bir yürüyüş yapmamı önerdi",
        "bu çeyrekte fiyatlar yine yükseldi merkez bankası ise enflasyona rağmen faiz oranlarını değiştirmedi",
        "açıkçası o sonu hiç beklemiyordum o kadar çok güldük ki komşular bizi duvarın arkasından kesin duymuştur",
        "şey evet yani aslında sadece şuradaki küçük düğmeye basıyorsun",
        "tamam şey bakalım belki şimdi biraz tuz ve karabiber ekleriz",
    ],
    "id": [
        HELD_OUT["id"],
        "iris bawang tipis-tipis lalu goreng dalam minyak zaitun sampai keemasan kemudian masukkan bawang putih dan aduk satu menit lagi",
        "dia memukul backhand kemenangan menyusuri garis dan penonton berdiri saat set terakhir berakhir",
        "mulai ulang ponselmu buka menu pengaturan dan pasang pembaruan terbaru sebelum menghubungkan printer",
        "kereta menuju kota tua berangkat dari peron sembilan dan tiket pulang pergi harganya sekitar lima belas euro per orang",
        "dokter saya menyarankan minum lebih banyak air tidur delapan jam dan berjalan kaki sebentar setiap hari",
        "harga naik lagi kuartal ini sementara bank sentral mempertahankan suku bunga meskipun inflasi meningkat",
        "jujur saya tidak menyangka akhir ceritanya kami tertawa begitu keras sampai tetangga pasti mendengar kami dari balik tembok",
        "eh iya jadi pada dasarnya kamu tinggal tekan tombol kecil yang ini",
        "oke hmm coba kita lihat mungkin sekarang kita tambahkan sedikit garam dan merica",
    ],
    "vi": [
        HELD_OUT["vi"],
        "thái hành tây thật nhỏ rồi phi trong dầu ô liu cho đến khi vàng sau đó thêm tỏi và đảo thêm một phút nữa",
        "cô ấy đánh một cú trái tay ăn điểm dọc biên và khán giả đứng dậy khi ván cuối cùng kết thúc",
        "khởi động lại điện thoại mở menu cài đặt và cài bản cập nhật mới nhất trước khi kết nối máy in",
        "chuyến tàu đến phố cổ khởi hành từ sân ga số chín và vé khứ hồi giá khoảng mười lăm euro mỗi người",
        "bác sĩ của tôi khuyên nên uống nhiều nước hơn ngủ đủ tám tiếng và đi bộ một quãng ngắn mỗi ngày",
        "giá cả lại tăng trong quý này trong khi ngân hàng trung ương giữ nguyên lãi suất bất chấp lạm phát",
        "thật sự mình không ngờ cái kết đó bọn mình cười to đến mức hàng xóm chắc chắn nghe thấy qua bức tường",
        "ờ thì về cơ bản bạn chỉ cần nhấn cái nút nhỏ này thôi",
        "được rồi để xem có lẽ bây giờ mình thêm một chút muối và tiêu",
    ],
    "ru": [
        HELD_OUT["ru"],
        "мелко нарежь лук и обжарь его в оливковом масле до золотистого цвета затем добавь чеснок и помешивай ещё минуту",
        "она выполнила победный удар слева по линии и зрители встали когда последний сет подошёл к концу",
        "перезагрузи телефон открой меню настроек и установи последнее обновление прежде чем подключать принтер",
        "поезд в старый город отправляется с девятого пути а билет туда и обратно стоит около пятнадцати евро с человека",
        "мой врач посоветовал пить больше воды спать восемь часов и каждый день совершать короткую прогулку",
        "цены снова выросли в этом квартале тогда как центральный банк оставил процентные ставки без изменений несмотря на инфляцию",
        "честно говоря я не ожидал такой концовки мы так громко смеялись что соседи наверняка слышали нас через стену",
        "э ну в общем просто нажимаешь вот на эту маленькую кнопку",
        "так ладно посмотрим может теперь добавим немного соли и перца",
    ],
    "uk": [
        HELD_OUT["uk"],
        "дрібно наріж цибулю і обсмаж її в оливковій олії до золотистого кольору потім додай часник і помішуй ще хвилину",
        "вона виконала переможний удар зліва по лінії і глядачі підвелися коли останній сет добіг кінця",
        "перезавантаж телефон відкрий меню налаштувань і встанови останнє оновлення перш ніж під'єднати принтер",
        "потяг до старого міста відправляється з дев'ятої колії а квиток туди й назад коштує близько п'ятнадцяти євро з особи",
        "мій лікар порадив пити більше води спати вісім годин і щодня робити коротку прогулянку",
        "ціни знову зросли цього кварталу тоді як центральний банк залишив відсоткові ставки без змін попри інфляцію",
        "чесно кажучи я не очікував такої кінцівки ми так голосно сміялися що сусіди напевно чули нас крізь стіну",
        "е ну загалом просто натискаєш ось цю маленьку кнопку",
        "гаразд подивимось може тепер додамо трохи солі та перцю",
    ],
    "ar": [
        HELD_OUT["ar"],
        "اقطع البصل قطعا صغيرة واقله في زيت الزيتون حتى يصبح ذهبيا ثم أضف الثوم وقلب لمدة دقيقة أخرى",
        "ضربت كرة خلفية حاسمة على طول الخط فوقف الجمهور عندما انتهت المجموعة الأخيرة",
        "أعد تشغيل هاتفك وافتح قائمة الإعدادات وثبت آخر تحديث قبل توصيل الطابعة",
        "يغادر القطار إلى المدينة القديمة من الرصيف التاسع وتكلف تذكرة الذهاب والعودة نحو خمسة عشر يورو للشخص",
        "نصحني الطبيب بشرب المزيد من الماء والنوم ثماني ساعات والمشي مسافة قصيرة كل يوم",
        "ارتفعت الأسعار مجددا هذا الربع بينما أبقى البنك المركزي أسعار الفائدة دون تغيير رغم التضخم",
        "بصراحة لم أتوقع تلك النهاية ضحكنا كثيرا حتى أن الجيران سمعونا عبر الجدار بالتأكيد",
        "اه نعم يعني ببساطة تضغط على هذا الزر الصغير هنا",
        "طيب يعني لنر ربما نضيف الآن قليلا من الملح والفلفل",
    ],
    "hi": [
        HELD_OUT["hi"],
        "प्याज़ को बारीक काट लें और जैतून के तेल में सुनहरा होने तक भूनें फिर लहसुन डालें और एक मिनट और चलाएं",
        "उसने लाइन के साथ एक विजयी बैकहैंड मारा और आख़िरी सेट ख़त्म होते ही दर्शक खड़े हो गए",
        "अपना फ़ोन दोबारा चालू करें सेटिंग्स मेनू खोलें और प्रिंटर जोड़ने से पहले नवीनतम अपडेट इंस्टॉल करें",
        "पुराने शहर की ट्रेन नौवें प्लेटफ़ॉर्म से छूटती है और आने जाने का टिकट प्रति व्यक्ति लगभग पंद्रह यूरो का है",
        "मेरे डॉक्टर ने ज़्यादा पानी पीने आठ घंटे सोने और रोज़ थोड़ी देर टहलने की सलाह दी",
        "इस तिमाही में दाम फिर बढ़े जबकि केंद्रीय बैंक ने महंगाई के बावजूद ब्याज दरें नहीं बदलीं",
        "सच कहूं तो मुझे उस अंत की उम्मीद नहीं थी हम इतनी ज़ोर से हंसे कि पड़ोसियों ने ज़रूर दीवार के पार सुना होगा",
        "अरे हां तो बस आपको यह छोटा सा बटन दबाना है",
        "अच्छा तो देखते हैं शायद अब थोड़ा नमक और काली मिर्च डालें",
    ],
    "ja": [
        HELD_OUT["ja"],
        "玉ねぎを細かく刻んでオリーブオイルできつね色になるまで炒めにんにくを加えてさらに一分混ぜます",
        "彼女はライン際にバックハンドのウィナーを決め最終セットが終わると観客は立ち上がりました",
        "プリンターをつなぐ前にスマホを再起動して設定メニューを開き最新のアップデートを入れてください",
        "旧市街行きの電車は九番線から出発し往復切符は一人あたり十五ユーロくらいです",
        "医者には水をもっと飲んで八時間寝て毎日少し散歩するように勧められました",
        "今期も物価は再び上昇しましたが中央銀行はインフレにもかかわらず金利を据え置きました",
        "正直あの結末は予想していなくて隣の人に壁越しに聞こえるくらい大笑いしました",
        "えーとまあ要するにこの小さいボタンを押すだけです",
        "はいえっとそうですね今度は塩とこしょうを少し加えましょうか",
    ],
    "ko": [
        HELD_OUT["ko"],
        "양파를 잘게 썰어 올리브유에 노릇해질 때까지 볶은 다음 마늘을 넣고 일 분 더 저어 주세요",
        "그녀는 라인을 따라 백핸드 위너를 성공시켰고 마지막 세트가 끝나자 관중이 일어섰습니다",
        "프린터를 연결하기 전에 휴대폰을 다시 시작하고 설정 메뉴를 열어 최신 업데이트를 설치하세요",
        "구시가지로 가는 기차는 구 번 승강장에서 출발하고 왕복 표는 한 사람에 십오 유로 정도입니다",
        "의사 선생님은 물을 더 많이 마시고 여덟 시간 자고 매일 잠깐 산책하라고 권했습니다",
        "이번 분기에도 물가가 다시 올랐지만 중앙은행은 인플레이션에도 불구하고 금리를 동결했습니다",
        "솔직히 그런 결말은 예상 못 했어요 우리가 너무 크게 웃어서 이웃이 벽 너머로 분명히 들었을 거예요",
        "어 네 그러니까 그냥 여기 이 작은 버튼을 누르면 돼요",
        "자 음 그럼 이제 소금이랑 후추를 조금 넣어 볼까요",
    ],
    "zh": [
        HELD_OUT["zh"],
        "把洋葱切碎用橄榄油炒到金黄然后加入大蒜再搅拌一分钟",
        "她沿边线打出一记反手制胜球最后一盘结束时观众都站了起来",
        "连接打印机之前先重启手机打开设置菜单安装最新的更新",
        "去老城的火车从九号站台出发往返车票每人大约十五欧元",
        "医生建议我多喝水睡够八个小时每天散一会儿步",
        "本季度物价再次上涨而央行尽管通胀仍维持利率不变",
        "说实话我没想到是那个结局我们笑得太大声邻居隔着墙肯定都听见了",
        "呃对其实你只要按一下这里这个小按钮就行了",
        "好的嗯我们看看也许现在加一点盐和胡椒",
    ],
    # round-5 additions (langid grew 20 -> 30 languages)
    "ro": [
        HELD_OUT["ro"],
        "toacă ceapa mărunt și călește-o în ulei de măsline până se rumenește apoi adaugă usturoiul și mai amestecă un minut",
        "ea a lovit un rever câștigător de-a lungul liniei iar publicul s-a ridicat în picioare când ultimul set s-a încheiat",
        "repornește telefonul deschide meniul de setări și instalează cea mai nouă actualizare înainte să conectezi imprimanta",
        "trenul spre orașul vechi pleacă de la peronul nouă iar un bilet dus-întors costă cam cincisprezece euro de persoană",
        "medicul meu mi-a recomandat să beau mai multă apă să dorm opt ore și să fac o plimbare scurtă în fiecare zi",
        "prețurile au crescut din nou în acest trimestru în timp ce banca centrală a menținut dobânzile neschimbate în ciuda inflației",
        "sincer nu mă așteptam la finalul ăsta am râs atât de tare încât probabil ne-au auzit vecinii prin perete",
        "ăă da păi practic doar apeși pe butonașul ăsta de aici",
        "bine hai să vedem poate mai punem acum puțină sare și piper",
    ],
    "hu": [
        HELD_OUT["hu"],
        "vágd apróra a hagymát és pirítsd olívaolajban aranybarnára majd add hozzá a fokhagymát és kevergesd még egy percig",
        "a lány fonák nyerőt ütött a vonal mentén és a közönség felállt amikor az utolsó szett véget ért",
        "indítsd újra a telefonod nyisd meg a beállítások menüt és telepítsd a legújabb frissítést mielőtt csatlakoztatod a nyomtatót",
        "a vonat az óvárosba a kilencedik vágányról indul és egy menettérti jegy fejenként körülbelül tizenöt euróba kerül",
        "az orvosom azt javasolta hogy igyak több vizet aludjak nyolc órát és sétáljak egy rövidet minden nap",
        "az árak ebben a negyedévben ismét emelkedtek miközben a jegybank az infláció ellenére változatlanul hagyta a kamatokat",
        "őszintén szólva nem számítottam erre a befejezésre annyira nevettünk hogy a szomszédok biztos áthallották a falon",
        "hát igen szóval igazából csak megnyomod ezt a kis gombot itt",
        "oké lássuk csak talán most hozzáadunk egy kis sót meg borsot",
    ],
    "fi": [
        HELD_OUT["fi"],
        "pilko sipulit hienoksi ja paista niitä oliiviöljyssä kunnes ne ovat kullanruskeita lisää sitten valkosipuli ja sekoita vielä minuutti",
        "hän löi voittavan rystylyönnin linjaa pitkin ja yleisö nousi seisomaan kun viimeinen erä päättyi",
        "käynnistä puhelimesi uudelleen avaa asetusvalikko ja asenna uusin päivitys ennen kuin yhdistät tulostimen",
        "juna vanhaan kaupunkiin lähtee raiteelta yhdeksän ja menopaluulippu maksaa noin viisitoista euroa hengeltä",
        "lääkärini suositteli juomaan enemmän vettä nukkumaan kahdeksan tuntia ja kävelemään lyhyen lenkin joka päivä",
        "hinnat nousivat jälleen tällä neljänneksellä kun keskuspankki piti korot ennallaan inflaatiosta huolimatta",
        "rehellisesti sanottuna en odottanut tuollaista loppua nauroimme niin kovaa että naapurit varmaan kuulivat seinän läpi",
        "öö joo eli periaatteessa painat vaan tätä pientä nappia tässä",
        "okei no katsotaan ehkä lisätään nyt vähän suolaa ja pippuria",
    ],
    "da": [
        HELD_OUT["da"],
        "hak løgene fint og steg dem i olivenolie til de er gyldne tilsæt så hvidløget og rør i et minut mere",
        "hun slog en baghåndsvinder langs linjen og publikum rejste sig da sidste sæt var slut",
        "genstart din telefon åbn indstillingsmenuen og installer den nyeste opdatering før du tilslutter printeren",
        "toget til den gamle bydel kører fra spor ni og en returbillet koster omkring femten euro pr person",
        "min læge anbefalede mig at drikke mere vand sove otte timer og gå en kort tur hver eneste dag",
        "priserne steg igen i dette kvartal mens centralbanken holdt renten uændret trods stigende inflation",
        "helt ærligt havde jeg ikke regnet med den slutning vi grinede så højt at naboerne sikkert kunne høre os gennem væggen",
        "øh ja altså du trykker bare på den her lille knap her",
        "okay øhm lad os se måske tilsætter vi lidt salt og peber nu",
    ],
    "no": [
        HELD_OUT["no"],
        "hakk løken fint og stek den i olivenolje til den er gyllen tilsett deretter hvitløken og rør i ett minutt til",
        "hun slo en vinnende backhand langs linjen og publikum reiste seg da siste sett var over",
        "start telefonen på nytt åpne innstillingsmenyen og installer den nyeste oppdateringen før du kobler til skriveren",
        "toget til gamlebyen går fra spor ni og en returbillett koster omtrent femten euro per person",
        "legen min anbefalte meg å drikke mer vann sove åtte timer og gå en kort tur hver eneste dag",
        "prisene steg igjen dette kvartalet mens sentralbanken holdt renten uendret til tross for økende inflasjon",
        "helt ærlig hadde jeg ikke ventet den slutten vi lo så høyt at naboene sikkert hørte oss gjennom veggen",
        "eh ja altså du trykker bare på denne lille knappen her",
        "ok ehm la oss se kanskje vi tilsetter litt salt og pepper nå",
    ],
    "el": [
        HELD_OUT["el"],
        "ψιλοκόψτε τα κρεμμύδια και σοτάρετέ τα σε ελαιόλαδο μέχρι να ροδίσουν μετά προσθέστε το σκόρδο και ανακατέψτε άλλο ένα λεπτό",
        "χτύπησε ένα νικητήριο ρεβέρ παράλληλα στη γραμμή και το κοινό σηκώθηκε όρθιο όταν τελείωσε το τελευταίο σετ",
        "επανεκκίνησε το τηλέφωνό σου άνοιξε το μενού ρυθμίσεων και εγκατάστησε την τελευταία ενημέρωση πριν συνδέσεις τον εκτυπωτή",
        "το τρένο για την παλιά πόλη φεύγει από την αποβάθρα εννέα και ένα εισιτήριο με επιστροφή κοστίζει περίπου δεκαπέντε ευρώ το άτομο",
        "ο γιατρός μου μού συνέστησε να πίνω περισσότερο νερό να κοιμάμαι οκτώ ώρες και να κάνω έναν μικρό περίπατο κάθε μέρα",
        "οι τιμές ανέβηκαν ξανά αυτό το τρίμηνο ενώ η κεντρική τράπεζα κράτησε τα επιτόκια αμετάβλητα παρά τον πληθωρισμό",
        "ειλικρινά δεν περίμενα αυτό το τέλος γελάσαμε τόσο δυνατά που μάλλον μας άκουσαν οι γείτονες μέσα από τον τοίχο",
        "ε ναι βασικά απλώς πατάς αυτό το κουμπάκι εδώ",
        "εντάξει για να δούμε ίσως προσθέσουμε λίγο αλάτι και πιπέρι τώρα",
    ],
    "he": [
        HELD_OUT["he"],
        "קוצצים את הבצל דק ומטגנים בשמן זית עד להזהבה ואז מוסיפים את השום ומערבבים עוד דקה",
        "היא חבטה מכת יד אחורית מנצחת לאורך הקו והקהל קם על רגליו כשהמערכה האחרונה הסתיימה",
        "הפעל מחדש את הטלפון פתח את תפריט ההגדרות והתקן את העדכון האחרון לפני שאתה מחבר את המדפסת",
        "הרכבת לעיר העתיקה יוצאת מרציף תשע וכרטיס הלוך ושוב עולה בערך חמישה עשר אירו לאדם",
        "הרופא שלי המליץ לשתות יותר מים לישון שמונה שעות וללכת הליכה קצרה כל יום",
        "המחירים עלו שוב ברבעון הזה בעוד הבנק המרכזי השאיר את הריבית ללא שינוי למרות האינפלציה",
        "בכנות לא ציפיתי לסוף הזה צחקנו כל כך חזק שהשכנים בטח שמעו אותנו דרך הקיר",
        "אה כן בעצם אתה פשוט לוחץ על הכפתור הקטן הזה כאן",
        "אוקיי בוא נראה אולי נוסיף עכשיו קצת מלח ופלפל",
    ],
    "fa": [
        HELD_OUT["fa"],
        "پیازها را ریز خرد کنید و در روغن زیتون تفت دهید تا طلایی شوند سپس سیر را اضافه کنید و یک دقیقه دیگر هم بزنید",
        "او یک بک‌هند برنده در امتداد خط زد و تماشاگران وقتی ست آخر تمام شد از جا بلند شدند",
        "گوشی خود را دوباره راه‌اندازی کنید منوی تنظیمات را باز کنید و آخرین به‌روزرسانی را نصب کنید پیش از آنکه چاپگر را وصل کنید",
        "قطار به شهر قدیمی از سکوی نه حرکت می‌کند و بلیت رفت و برگشت برای هر نفر حدود پانزده یورو است",
        "پزشکم توصیه کرد آب بیشتری بنوشم هشت ساعت بخوابم و هر روز پیاده‌روی کوتاهی داشته باشم",
        "قیمت‌ها در این فصل دوباره بالا رفتند در حالی که بانک مرکزی با وجود تورم نرخ بهره را بدون تغییر نگه داشت",
        "راستش انتظار چنین پایانی را نداشتم آنقدر بلند خندیدیم که همسایه‌ها حتما از پشت دیوار صدایمان را شنیدند",
        "اوم آره خب در واقع فقط همین دکمه کوچک را اینجا فشار می‌دهی",
        "خب ببینیم شاید حالا کمی نمک و فلفل اضافه کنیم",
    ],
    "th": [
        HELD_OUT["th"],
        "หั่นหอมใหญ่ให้ละเอียดแล้วผัดในน้ำมันมะกอกจนเป็นสีทองจากนั้นใส่กระเทียมแล้วคนต่ออีกหนึ่งนาที",
        "เธอตีแบ็คแฮนด์ชนะไปตามเส้นและผู้ชมลุกขึ้นยืนเมื่อเซตสุดท้ายจบลง",
        "รีสตาร์ทโทรศัพท์ของคุณเปิดเมนูการตั้งค่าแล้วติดตั้งอัปเดตล่าสุดก่อนเชื่อมต่อเครื่องพิมพ์",
        "รถไฟไปเมืองเก่าออกจากชานชาลาเก้าและตั๋วไปกลับราคาประมาณสิบห้ายูโรต่อคน",
        "หมอแนะนำให้ฉันดื่มน้ำมากขึ้นนอนแปดชั่วโมงและเดินเล่นสั้นๆทุกวัน",
        "ราคาสินค้าเพิ่มขึ้นอีกครั้งในไตรมาสนี้ขณะที่ธนาคารกลางคงอัตราดอกเบี้ยไว้แม้เงินเฟ้อจะสูงขึ้น",
        "พูดตรงๆฉันไม่คิดว่าจะจบแบบนั้นเราหัวเราะกันดังมากจนเพื่อนบ้านคงได้ยินผ่านกำแพง",
        "เอ่อใช่ก็แค่กดปุ่มเล็กๆตรงนี้",
        "โอเคลองดูบางทีตอนนี้เราอาจจะเติมเกลือกับพริกไทยอีกนิด",
    ],
    "bn": [
        HELD_OUT["bn"],
        "পেঁয়াজ মিহি করে কেটে জলপাই তেলে সোনালি হওয়া পর্যন্ত ভাজুন তারপর রসুন দিয়ে আরও এক মিনিট নাড়ুন",
        "সে লাইন বরাবর একটি জয়সূচক ব্যাকহ্যান্ড মারল এবং শেষ সেট শেষ হলে দর্শকরা উঠে দাঁড়াল",
        "আপনার ফোনটি পুনরায় চালু করুন সেটিংস মেনু খুলুন এবং প্রিন্টার সংযোগ করার আগে সর্বশেষ আপডেট ইনস্টল করুন",
        "পুরনো শহরে যাওয়ার ট্রেনটি নয় নম্বর প্ল্যাটফর্ম থেকে ছাড়ে এবং যাওয়া-আসার টিকিটের দাম জনপ্রতি প্রায় পনের ইউরো",
        "আমার ডাক্তার আমাকে বেশি পানি খেতে আট ঘণ্টা ঘুমাতে এবং প্রতিদিন একটু হাঁটতে বলেছেন",
        "এই প্রান্তিকে দাম আবার বেড়েছে যদিও কেন্দ্রীয় ব্যাংক মূল্যস্ফীতি সত্ত্বেও সুদের হার অপরিবর্তিত রেখেছে",
        "সত্যি বলতে আমি এমন সমাপ্তি আশা করিনি আমরা এত জোরে হেসেছিলাম যে প্রতিবেশীরা নিশ্চয়ই দেয়ালের ওপাশ থেকে শুনেছে",
        "আঁ হ্যাঁ মানে আসলে তুমি শুধু এখানে এই ছোট্ট বোতামটা চাপো",
        "আচ্ছা দেখি হয়তো এখন একটু লবণ আর গোলমরিচ দেব",
    ],
}

# accuracy floors for the table test: every long-form register sentence must
# classify, short noisy ASR strings may drop a few overall
_NOISY_START = 8  # index where the short noisy ASR strings begin


def test_langid_heldout_accuracy_table():
    """Accuracy over 200 held-out texts (10 per language, 7 registers + 2
    short noisy ASR strings). The measured table is documented in
    COMPONENTS.md; this asserts the floors so regressions surface."""
    per_lang = {}
    failures = []
    n_long = n_long_ok = n_noisy = n_noisy_ok = 0
    for lang, sents in HELD_OUT_MULTI.items():
        assert len(sents) == 10, lang
        ok = 0
        for i, s in enumerate(sents):
            got = langid.detect(s)
            hit = got == lang
            ok += hit
            if i < _NOISY_START:
                n_long += 1
                n_long_ok += hit
            else:
                n_noisy += 1
                n_noisy_ok += hit
            if not hit:
                failures.append((lang, i, got))
        per_lang[lang] = ok / len(sents)
    overall = sum(per_lang.values()) / len(per_lang)
    table = ", ".join(f"{k}={v:.0%}" for k, v in sorted(per_lang.items()))
    # long-form registers: perfect
    assert n_long_ok == n_long, (table, failures)
    # short noisy ASR strings: >= 90% overall, no language below 50%
    assert n_noisy_ok / n_noisy >= 0.90, (table, failures)
    assert min(per_lang.values()) >= 0.8, (table, failures)
    assert overall >= 0.97, (table, failures)


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
