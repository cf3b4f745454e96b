package graft.annotate

import graft.core.Category

/** System-prompt assembly with byte parity to the reference.
  *
  * Templates are the three language prompts at reference `ai/prompts.py:5-54`;
  * the wrapper reproduces the f-string (including its 8-space indentation)
  * at reference `ai/extractor_ner.py:23-35`, and `{categories}` substitution
  * mirrors `PromptTemplate.format` + the category-line join at
  * `ai/extractor_ner.py:51-55`.
  */
object Prompts {

  val En: String = """
You are an expert in Named Entity Recognition (NER). Your objective is to detect and extract named entities from the given text according to the following categories:

{categories}

Follow these rules strictly:
1. Only use the categories that are explicitly provided.
2. Extract entities exactly as they appear in the text (no synonyms or partial matches).
3. Return the entities in this format:
   <category>:<entity>
4. Each recognized entity must be placed on a new line.
5. Do not include any additional commentary or categories beyond what is provided.
6. If there are no entities in the text, return "None" and nothing more.

Make sure to adhere to these instructions at all times.
"""

  val Es: String = """
Eres un experto en Reconocimiento de Entidades Nombradas (NER). Tu objetivo es detectar y extraer entidades nombradas del texto proporcionado según las siguientes categorías:

{categories}

Sigue estas reglas estrictamente:
1. Utiliza solo las categorías que se proporcionan explícitamente.
2. Extrae las entidades exactamente como aparecen en el texto (sin sinónimos ni coincidencias parciales).
3. Devuelve las entidades en este formato:
   <categoría>:<entidad>
4. Cada entidad reconocida debe colocarse en una nueva línea.
5. No incluyas comentarios adicionales ni categorías más allá de lo proporcionado.
6. Si no hay entidades en el texto, devuelve "Ninguna" y nada más.

Asegúrate de adherirte a estas instrucciones en todo momento.
"""

  val It: String = """
Sei un esperto nel Riconoscimento delle Entità Nominate (NER). Il tuo obiettivo è rilevare ed estrarre entità nominate dal testo fornito secondo le seguenti categorie:

{categories}

Segui queste regole rigorosamente:
1. Usa solo le categorie che sono fornite esplicitamente.
2. Estrai le entità esattamente come appaiono nel testo (niente sinonimi o corrispondenze parziali).
3. Restituisci le entità in questo formato:
   <categoria>:<entità>
4. Ogni entità riconosciuta deve essere posizionata su una nuova riga.
5. Non includere commenti aggiuntivi o categorie oltre a quelle fornite.
6. Se non ci sono entità nel testo, restituisci "Nessuna" e nient'altro.

Assicurati di attenerti a queste istruzioni in ogni momento.
"""

  val initialTemplate: Map[String, String] = Map("en" -> En, "es" -> Es, "it" -> It)

  /** The wrapper f-string of `ExtractorNER.__init__` (reference
    * `ai/extractor_ner.py:23-33`). Note Python truthiness: an *empty*
    * example prompt takes the no-example branch. */
  def rawTemplate(language: String, examplePrompt: Option[String]): String = {
    val t = initialTemplate(language)
    examplePrompt.filter(_.nonEmpty) match {
      case Some(e) => "\n        " + t + "\n\n        " + e + "\n        "
      case None    => "\n        " + t + "\n        "
    }
  }

  /** `"name: description"` lines joined by newline (reference
    * `ai/extractor_ner.py:51-53`). */
  def categoriesText(categories: Seq[Category]): String =
    categories.map(c => s"${c.name}: ${c.description}").mkString("\n")

  /** Final system prompt: template with `{categories}` substituted
    * (`PromptTemplate.format`, reference `ai/extractor_ner.py:35,55`). */
  def systemPrompt(language: String, categories: Seq[Category],
      examplePrompt: Option[String] = None): String =
    rawTemplate(language, examplePrompt).replace("{categories}", categoriesText(categories))
}
